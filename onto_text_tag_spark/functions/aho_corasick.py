"""Pure-Python Aho–Corasick automaton for dictionary phrase matching.

The reference tags text with an exact-dictionary matcher (OGER ``Router``
over a termlist, app.py:57-60,681-708; build-time equivalent is a spaCy
``PhraseMatcher`` with ``attr='LOWER'``, ontotagtext.py:110-111): case-
insensitive exact phrase matching at token boundaries, overlapping
candidates resolved longest-match-wins (``filter_spans``,
ontotagtext.py:137).

``pyahocorasick`` (C extension) is not available in this environment, so
this is a dict-of-dicts automaton with goto/fail/output links.  It is
picklable, so the driver builds it ONCE from the dictionary table and
ships it to executors via ``sc.broadcast`` — the classic "compile-once
match automaton" device of the reference (the PhraseMatcher built at
import, SURVEY.md §4) translated to Spark's broadcast mechanism.

Scale note: matching is O(len(text) + matches) per document and the
automaton is shared read-only across all tasks of an executor; on a real
cluster each executor deserializes it once per Python worker.  For a
3,818-surface dictionary the pickle is well under a megabyte; even
million-surface dictionaries stay in the tens of MB, comfortably
broadcastable.
"""

from __future__ import annotations

from collections import deque


def _is_word_char(ch: str) -> bool:
    return ch.isalnum() or ch == "_"


class AhoCorasick:
    """Multi-pattern matcher over lowercase text.

    ``add(surface, payload)`` registers a pattern (lowercased); ``build()``
    wires failure links; ``find(text)`` yields token-boundary-aligned
    matches ``(begin, end, surface, payload)``.
    """

    __slots__ = ("_goto", "_fail", "_out", "_built")

    def __init__(self) -> None:
        self._goto: list[dict[str, int]] = [{}]
        self._fail: list[int] = [0]
        self._out: list[list[tuple[int, str, object]]] = [[]]
        self._built = False

    def add(self, surface: str, payload: object) -> None:
        if self._built:
            raise RuntimeError("automaton already built")
        pattern = surface.lower()
        if not pattern:
            return
        state = 0
        for ch in pattern:
            nxt = self._goto[state].get(ch)
            if nxt is None:
                nxt = len(self._goto)
                self._goto.append({})
                self._fail.append(0)
                self._out.append([])
                self._goto[state][ch] = nxt
            state = nxt
        self._out[state].append((len(pattern), pattern, payload))

    def build(self) -> "AhoCorasick":
        queue = deque()
        for child in self._goto[0].values():
            self._fail[child] = 0
            queue.append(child)
        while queue:
            state = queue.popleft()
            for ch, child in self._goto[state].items():
                queue.append(child)
                f = self._fail[state]
                while f and ch not in self._goto[f]:
                    f = self._fail[f]
                self._fail[child] = self._goto[f].get(ch, 0)
                if self._fail[child] == child:
                    self._fail[child] = 0
                self._out[child] = self._out[child] + self._out[self._fail[child]]
        self._built = True
        return self

    def find(self, text: str) -> list[tuple[int, int, str, object]]:
        """All token-boundary-aligned matches over ``text`` (any case).

        A match is kept only when the character before ``begin`` and the
        character at ``end`` are non-word characters (or text edges) —
        "smoker" must not match "smoke" (FIXTURES.md §4).
        """
        lower = text.lower()
        n = len(lower)
        state = 0
        results: list[tuple[int, int, str, object]] = []
        for i, ch in enumerate(lower):
            while state and ch not in self._goto[state]:
                state = self._fail[state]
            state = self._goto[state].get(ch, 0)
            if self._out[state]:
                end = i + 1
                if end < n and _is_word_char(lower[end]):
                    continue
                for length, pattern, payload in self._out[state]:
                    begin = end - length
                    if begin > 0 and _is_word_char(lower[begin - 1]):
                        continue
                    results.append((begin, end, pattern, payload))
        return results


def filter_spans(
    spans: list[tuple[int, int, str, object]],
) -> list[tuple[int, int, str, object]]:
    """Longest-match-wins overlap resolution (W1).

    Re-derivation of spaCy ``filter_spans`` (used at ontotagtext.py:137):
    sort candidates by (length desc, begin asc), greedily keep spans whose
    character range is disjoint from everything kept so far, then return
    in document order.
    """
    from bisect import bisect_right, insort

    ordered = sorted(spans, key=lambda s: (-(s[1] - s[0]), s[0]))
    kept: list[tuple[int, int, str, object]] = []
    # kept intervals as a sorted list of (begin, end): overlap test +
    # insert are O(log k) — the per-character occupied-set version costs
    # O(span_length) per span and dominates on match-dense documents
    starts: list[tuple[int, int]] = []
    for span in ordered:
        begin, end = span[0], span[1]
        idx = bisect_right(starts, (begin, end))
        if idx < len(starts) and starts[idx][0] < end:
            continue  # next interval starts inside [begin, end)
        if idx > 0 and starts[idx - 1][1] > begin:
            continue  # previous interval extends into [begin, end)
        insort(starts, (begin, end))
        kept.append(span)
    kept.sort(key=lambda s: (s[0], s[1]))
    return kept


def build_automaton(entries) -> AhoCorasick:
    """Build from iterable of ``(surface, payload)``; last add wins is NOT
    applied here — callers dedupe surfaces first (collision policy A5)."""
    ac = AhoCorasick()
    for surface, payload in entries:
        ac.add(surface, payload)
    return ac.build()


import re as _re

_TOKEN_RE = _re.compile(r"\w+")


def _trie_regex(words) -> str:
    """Compile a word set into a prefix-shared regex alternation.

    ``(?:smoke|smoking|smoker)`` makes the re engine retry each branch
    per position; the trie form ``smok(?:e|ing|er)`` shares prefixes so
    matching is near-linear.  Greedy ``?`` on the terminal marker tries
    longer continuations first → longest token wins at each position
    (then the outer ``(?!\\w)`` pins the full-token requirement).
    """
    trie: dict = {}
    for w in words:
        node = trie
        for ch in w:
            node = node.setdefault(ch, {})
        node[""] = True  # terminal

    def emit(node: dict) -> str:
        terminal = "" in node
        alts = [
            _re.escape(ch) + emit(child)
            for ch, child in sorted(node.items())
            if ch != ""
        ]
        if not alts:
            return ""
        if len(alts) == 1:
            body = alts[0]
            if not terminal:
                return body
            return "(?:" + body + ")?"
        body = "(?:" + "|".join(alts) + ")"
        return body + "?" if terminal else body

    if not trie:
        return r"(?!x)x"  # matches nothing
    return emit(trie)


class TokenIndexMatcher:
    """Drop-in replacement for ``AhoCorasick.find`` with the SAME match
    semantics (every token-boundary-aligned case-insensitive occurrence of
    every surface, overlaps included) but a C-speed hot path.

    The per-character Python AC loop costs ~0.4 µs/char — ~2 ms for a
    realistic 5 KB web page, and it IS the pipeline's CPU budget.  This
    matcher does one ``\\w+`` ``finditer`` pass (C regex engine), then a
    single dict probe per token (surfaces indexed by their first token)
    and a ``str.startswith`` slice-compare per candidate (C memcmp).
    ~10-20x faster per document; equivalence with ``AhoCorasick.find`` is
    property-tested in tests/test_tagger.py.

    Surfaces whose first character is a non-word char (cannot be anchored
    to a token start) fall back to an explicit ``str.find`` scan — rare
    by construction (ontology labels start alphanumerically).
    """

    __slots__ = ("_index", "_oddballs", "_pattern_src", "_compiled")

    def __init__(self) -> None:
        # first_token -> list of (surface_lower, payload)
        self._index: dict[str, list[tuple[str, object]]] = {}
        self._oddballs: list[tuple[str, object]] = []
        self._pattern_src: str | None = None
        self._compiled = None

    def add(self, surface: str, payload: object) -> None:
        pattern = surface.lower()
        if not pattern:
            return
        m = _TOKEN_RE.match(pattern)
        if m is None:  # starts with a non-word char
            self._oddballs.append((pattern, payload))
            return
        self._index.setdefault(m.group(0), []).append((pattern, payload))
        self._pattern_src = None  # invalidate

    def build(self) -> "TokenIndexMatcher":
        # Trie-structured alternation over FIRST TOKENS: candidate
        # discovery runs entirely in the C regex engine; Python only
        # touches positions where a dictionary first token occurs (a
        # small fraction of tokens on web text).  The pattern CONSUMES
        # one leading non-word char instead of using a lookbehind: the
        # engine's first-character bitmap then only attempts the trie at
        # separator positions (~1/6 of web text) rather than at every
        # character, ~25% faster than the `(?<!\w)trie(?!\w)` form
        # (measured; `find` pads the text with one leading space so
        # doc-start tokens keep an anchor, and strips the pad from the
        # reported offsets).  Non-overlap is unaffected: the consumed
        # anchor is the separator BEFORE the token, and any following
        # match anchors on its own separator.
        self._pattern_src = (
            r"\W(?:" + _trie_regex(self._index.keys()) + r")(?!\w)"
        )
        self._compiled = None
        return self

    def __getstate__(self):  # compiled regexes don't pickle — rebuild lazily
        return (self._index, self._oddballs, self._pattern_src)

    def __setstate__(self, state):
        self._index, self._oddballs, self._pattern_src = state
        self._compiled = None

    def find(self, text: str) -> list[tuple[int, int, str, object]]:
        if self._compiled is None:
            if self._pattern_src is None:
                self.build()
            self._compiled = _re.compile(self._pattern_src)
        lower = text.lower()
        n = len(lower)
        index = self._index
        results: list[tuple[int, int, str, object]] = []
        # pad with one separator so doc-start tokens anchor; padded index
        # p-1 == original index, and each match starts ON its anchor char,
        # so m.start() is already the original token offset
        for m in self._compiled.finditer(" " + lower):
            begin = m.start()
            for pattern, payload in index[m.group(0)[1:]]:
                end = begin + len(pattern)
                if end <= n and lower.startswith(pattern, begin):
                    # token start gives the begin boundary for free (the
                    # trie hit is a maximal token); check only the end
                    if end == n or not _is_word_char(lower[end]):
                        results.append((begin, end, pattern, payload))
        for pattern, payload in self._oddballs:
            start = 0
            while True:
                begin = lower.find(pattern, start)
                if begin < 0:
                    break
                end = begin + len(pattern)
                if (begin == 0 or not _is_word_char(lower[begin - 1])) and (
                    end == n or not _is_word_char(lower[end])
                ):
                    results.append((begin, end, pattern, payload))
                start = begin + 1
        return results


def build_matcher(entries) -> TokenIndexMatcher:
    """Build the fast matcher from ``(surface, payload)`` pairs."""
    tm = TokenIndexMatcher()
    for surface, payload in entries:
        tm.add(surface, payload)
    return tm.build()
