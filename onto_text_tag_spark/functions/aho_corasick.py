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
    ordered = sorted(spans, key=lambda s: (-(s[1] - s[0]), s[0]))
    kept: list[tuple[int, int, str, object]] = []
    occupied: set[int] = set()
    for span in ordered:
        begin, end = span[0], span[1]
        if any(p in occupied for p in range(begin, end)):
            continue
        kept.append(span)
        occupied.update(range(begin, end))
    kept.sort(key=lambda s: (s[0], s[1]))
    return kept


def build_automaton(entries) -> AhoCorasick:
    """Build from iterable of ``(surface, payload)``; last add wins is NOT
    applied here — callers dedupe surfaces first (collision policy A5)."""
    ac = AhoCorasick()
    for surface, payload in entries:
        ac.add(surface, payload)
    return ac.build()
