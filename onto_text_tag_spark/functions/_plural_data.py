"""Pluralization rule tables — generated from inflect 7.3.1.

inflect (https://pypi.org/project/inflect/, MIT license) is the
library the reference uses for surface-form expansion
(ontotagtext.py:9,70; app.py:630-637).  It is not installable in
this environment, so the noun/verb tables its plural() path needs
were extracted once into this module; the rule LOGIC is re-derived
in pluralize.py.  Differential parity with the real library is
pinned by tests/test_dictionary.py against the reference fixture
static/test_terms.tsv (1,909 real (base, plural) pairs).

GENERATED FILE - regenerate with the dump script in the test
docstring if inflect parity requirements change.
"""

PREP_LIST = ('about', 'above', 'across', 'after', 'among', 'around', 'at', 'athwart',
 'before', 'behind', 'below', 'beneath', 'beside', 'besides', 'between',
 'betwixt', 'beyond', 'but', 'by', 'during', 'except', 'for', 'from', 'in',
 'into', 'near', 'of', 'off', 'on', 'onto', 'out', 'over', 'since', 'till',
 'to', 'under', 'until', 'unto', 'upon', 'with', 'de', 'du', 'da')

SB_UNINFLECTED_COMPLETE = ('bream', 'breeches', 'britches', 'cantus', 'carp', 'chassis', 'clippers',
 'cod', 'coitus', 'contretemps', 'corps', 'debris', 'diabetes', 'djinn',
 'flounder', 'gallows', 'graffiti', 'haggis', 'headquarters', 'herpes',
 'hertz', 'hijinks', 'innings', 'jackanapes', 'mackerel', 'mews', 'moose',
 'mumps', 'news', 'nexus', 'offspring', 'pajamas', 'pence', 'pincers',
 'pliers', 'proceedings', 'pyjamas', 'quid', 'rabies', 'salmon', 'samuri',
 'scissors', 'sea bass', 'sea-bass', 'series', 'shears', 'siemens',
 'species', 'subspecies', 'testes', 'trousers', 'trout', 'tuna', 'whiting')

SB_UNINFLECTED_CAPS = ('Amoyese', 'Borghese', 'Congoese', 'Faroese', 'Foochowese', 'Genevese',
 'Genoese', 'Gilbertese', 'Hottentotese', 'Kiplingese', 'Kongoese',
 'Lucchese', 'Maltese', 'Nankingese', 'Niasese', 'Pekingese', 'Piedmontese',
 'Pistoiese', 'Portuguese', 'Sarawakese', 'Shavese', 'Vermontese',
 'Wenchowese', 'Yengeese')

SB_UNINFLECTED_BYSIZE = {3: ('ois', 'pox'),
 4: ('cash', 'deer', 'fish', 'lese', 'mese', 'nese', 'rese'),
 5: ('craft', 'sheep'),
 6: ('butter',),
 7: ('measles',),
 9: ('furniture',),
 11: ('information',)}

SB_IRREGULAR = {'atlas': 'atlases|atlantes',
 'atman': 'atmas',
 'beef': 'beefs|beeves',
 'brother': 'brothers|brethren',
 'carmen': 'carmina',
 'child': 'children',
 'chili': 'chilis|chilies',
 'corpus': 'corpuses|corpora',
 'cow': 'cows|kine',
 'flatfoot': 'flatfoots',
 'ganglion': 'ganglions|ganglia',
 'genie': 'genies|genii',
 'genus': 'genera',
 'graffito': 'graffiti',
 'hoof': 'hoofs|hooves',
 'infinity': 'infinities|infinity',
 'jerry': 'jerries',
 'loaf': 'loaves',
 'lore': 'lores|lore',
 'lowlife': 'lowlifes',
 'mary': 'maries',
 'money': 'monies',
 'mongoose': 'mongooses',
 'mythos': 'mythoi',
 'numen': 'numina',
 'occiput': 'occiputs|occipita',
 'octopus': 'octopuses|octopodes',
 'opus': 'opuses|opera',
 'ox': 'oxen',
 'penis': 'penises|penes',
 'rom': 'roma',
 'romany': 'romanies',
 'sabertooth': 'sabertooths',
 'sabretooth': 'sabretooths',
 'talouse': 'talouses',
 'tenderfoot': 'tenderfoots',
 'testis': 'testes',
 'thief': 'thiefs|thieves',
 'trilby': 'trilbys',
 'turf': 'turfs|turves',
 'yes': 'yeses'}

SB_IRREGULAR_CAPS = {'Jerry': 'Jerrys', 'Mary': 'Marys', 'Rom': 'Roma', 'Romany': 'Romanies'}

SB_IRREGULAR_COMPOUND = {'prima donna': 'prima donnas|prime donne'}

SB_U_MAN_MANS_BYSIZE = {5: ('human', 'leman'),
 6: ('ataman', 'caiman', 'cayman', 'desman', 'dolman', 'farman', 'harman',
     'hetman', 'shaman'),
 7: ('ceriman', 'ottoman'),
 8: ('talisman',)}

SB_U_MAN_MANS_CAPS_BYSIZE = {5: ('Liman', 'Roman', 'Yuman'),
 6: ('Burman', 'German', 'Norman', 'Selman'),
 7: ('Bahaman', 'Panaman', 'Sonaman', 'Tacoman', 'Yakiman'),
 8: ('Alabaman',),
 9: ('Nakayaman', 'Oklahoman', 'Yokohaman'),
 10: ('Hiroshiman',)}

SB_U_LOUSE_LICE_BYSIZE = {5: ('louse',), 9: ('booklouse', 'woodlouse'), 10: ('grapelouse',)}

SB_U_CH_CHS_BYSIZE = {5: ('czech',), 6: ('eunuch',), 7: ('stomach',)}

SB_U_EX_ICES_BYSIZE = {5: ('codex', 'murex', 'silex')}

SB_U_IX_ICES_BYSIZE = {5: ('helix', 'radix')}

SB_U_UM_A_BYSIZE = {4: ('ovum',),
 5: ('datum',),
 7: ('agendum', 'erratum', 'stratum'),
 8: ('extremum',),
 9: ('bacterium',),
 11: ('candelabrum', 'desideratum')}

SB_U_US_I_BYSIZE = {5: ('locus',),
 7: ('alumnus', 'nucleus'),
 8: ('alveolus', 'bacillus', 'bronchus', 'meniscus', 'stimulus'),
 11: ('sarcophagus',)}

SB_U_ON_A_BYSIZE = {7: ('organon',),
 8: ('aphelion', 'noumenon'),
 9: ('asyndeton', 'criterion'),
 10: ('hyperbaton', 'perihelion', 'phenomenon'),
 12: ('prolegomenon',)}

SB_U_A_AE_BYSIZE = {4: ('alga', 'vita'), 6: ('alumna',), 7: ('persona',), 8: ('vertebra',)}

SB_SINGULAR_S_COMPLETE = ('acropolis', 'aegis', 'alias', 'asbestos', 'bathos', 'bias', 'bronchitis',
 'bursitis', 'caddis', 'cannabis', 'canvas', 'chaos', 'chrysalis',
 'clitoris', 'cosmos', 'dais', 'digitalis', 'ephemeris', 'epidermis',
 'epididymis', 'ethos', 'eyas', 'gas', 'glottis', 'hubris', 'ibis', 'iris',
 'lens', 'mantis', 'marquis', 'metropolis', 'pathos', 'pelvis', 'polis',
 'rhinoceros', 'sassafras', 'trellis')

SB_SINGULAR_S_BYSIZE = {2: ('ss', 'us'), 4: ('itis',)}

SB_Z_ZES_BYSIZE = {5: ('topaz',), 6: ('quartz',)}

SB_ZE_ZES_BYSIZE = {6: ('snooze',)}

SB_U_O_OS_COMPLETE = ('ISO', 'NATO', 'NCO', 'NGO', 'ado', 'oto')

SB_U_O_OS_BYSIZE = {3: ('WHO', 'WTO', 'myo', 'pro', 'ufo'),
 4: ('Biro', 'Boto', 'Faro', 'Lilo', 'Oslo', 'Togo', 'Zibo', 'alto', 'ammo',
     'auto', 'coco', 'demo', 'euro', 'gyro', 'info', 'kilo', 'lido', 'limo',
     'lino', 'loco', 'logo', 'memo', 'mono', 'pogo', 'polo', 'repo', 'sago',
     'silo', 'solo', 'sumo', 'tiro', 'typo', 'tyro', 'zero'),
 5: ('Cairo', 'Draco', 'Idaho', 'Pluto', 'Porto', 'Quito', 'Taiko', 'Tokyo',
     'Virgo', 'aggro', 'basso', 'bimbo', 'bingo', 'bongo', 'burro', 'canto',
     'cello', 'credo', 'cyano', 'ditto', 'gizmo', 'guano', 'gumbo', 'hippo',
     'jumbo', 'junto', 'limbo', 'lingo', 'macho', 'macro', 'metro', 'micro',
     'panto', 'photo', 'piano', 'pinto', 'pleco', 'rhino', 'rondo', 'saddo',
     'salvo', 'stylo', 'tempo', 'torso', 'verso', 'yo-yo'),
 6: ('Bamako', 'Iquico', 'Kakapo', 'Kokako', 'Kosovo', 'Majuro', 'Malabo',
     'Maputo', 'Mexico', 'Milano', 'Monaco', 'Ningbo', 'Torino', 'UNESCO',
     'albino', 'bolero', 'casino', 'dynamo', 'embryo', 'fiasco', 'ghetto',
     'gigolo', 'gringo', 'hairdo', 'libero', 'libido', 'lineno', 'livedo',
     'medico', 'octavo', 'pedalo', 'poncho', 'psycho', 'pueblo', 'quarto',
     'rococo', 'sterno', 'stucco', 'techno', 'torero', 'weirdo'),
 7: ('Bolzano', 'Chicago', 'Colombo', 'Gestapo', 'Lesotho', 'Morocco',
     'Orinoco', 'Orlando', 'Sapporo', 'Toronto', 'allegro', 'avocado',
     'cochito', 'furioso', 'inferno', 'lumbago', 'mafioso', 'magneto',
     'oregano', 'pimento', 'risotto', 'scherzo', 'sirocco', 'soprano',
     'testudo', 'timpano', 'tobacco', 'tremolo', 'vaquero', 'vibrato'),
 8: ('Chimango', 'Colorado', 'Filipino', 'Muqdisho', 'Pardusco', 'Santiago',
     'Sarajevo', 'cilantro', 'commando', 'contango', 'espresso', 'falsetto',
     'flamenco', 'impetigo', 'libretto', 'neutrino', 'sombrero', 'staccato',
     'terrazzo', 'virtuoso'),
 9: ('Esperanto', 'Guaiabero', 'Kinkimavo', 'Maracaibo', 'armadillo',
     'contralto', 'crescendo', 'magnifico', 'manifesto'),
 10: ('Greensboro', 'Montenegro', 'Paramaribo', 'Porto-Novo', 'Sacramento',
      'aficionado', 'cappuccino', 'concertino', 'intermezzo', 'intertrigo',
      'scherzando', 'vermicello'),
 11: ('archipelago', 'violoncello'),
 12: ('Antananarivo', 'Barquisimeto', 'Yamoussoukro'),
 13: ('generalissimo',)}

VERB_IRREGULAR_PRES = {'am': 'are',
 'are': 'are',
 'do': 'do',
 'does': 'do',
 'has': 'have',
 'have': 'have',
 'is': 'are',
 'was': 'were',
 'were': 'were'}

VERB_IRREGULAR_NON_PRES = ('ate', 'could', 'did', 'fought', 'gave', 'had', 'made', 'ought', 'put',
 'sank', 'shall', 'should', 'sought', 'spent')

V_OES_OE = ('canoes', 'floes', 'oboes', 'roes', 'throes', 'woes')

V_OES_OE_ENDINGS_SIZE4 = ('hoes', 'toes')

V_OES_OE_ENDINGS_SIZE5 = ('shoes',)

PRON_NOM = {'he': 'they',
 'hers': 'theirs',
 'herself': 'themselves',
 'himself': 'themselves',
 'his': 'theirs',
 'i': 'we',
 'it': 'they',
 'its': 'theirs',
 'itself': 'themselves',
 'mine': 'ours',
 'myself': 'ourselves',
 'she': 'they',
 'theirs': 'theirs',
 'themself': 'themselves',
 'they': 'they',
 'you': 'you',
 'yours': 'yours',
 'yourself': 'yourselves'}

PRON_ACC = {'her': 'them',
 'herself': 'themselves',
 'him': 'them',
 'himself': 'themselves',
 'it': 'them',
 'itself': 'themselves',
 'me': 'us',
 'myself': 'ourselves',
 'them': 'them',
 'themself': 'themselves',
 'you': 'you',
 'yourself': 'yourselves'}

PRON_ACC_KEYS_BYSIZE = {2: ('it', 'me'),
 3: ('her', 'him', 'you'),
 4: ('them',),
 6: ('itself', 'myself'),
 7: ('herself', 'himself'),
 8: ('themself', 'yourself')}

PREP_BYSIZE = {2: ('at', 'by', 'da', 'de', 'du', 'in', 'of', 'on', 'to'),
 3: ('but', 'for', 'off', 'out'),
 4: ('from', 'into', 'near', 'onto', 'over', 'till', 'unto', 'upon',
     'with'),
 5: ('about', 'above', 'after', 'among', 'below', 'since', 'under',
     'until'),
 6: ('across', 'around', 'before', 'behind', 'beside', 'beyond', 'during',
     'except'),
 7: ('athwart', 'beneath', 'besides', 'between', 'betwixt')}

ADJ_SPECIAL = {'a': 'some', 'an': 'some', 'that': 'those', 'this': 'these'}

ADJ_POSS = {'her': 'their',
 'his': 'their',
 'its': 'their',
 'my': 'our',
 'their': 'their',
 'your': 'your'}

DUAL_COMPOUND_RE = '^(?:(.*?)((?:-|\\s+)(?:(?:about|above|across|after|among|around|at|athwart|before|behind|below|beneath|beside|besides|between|betwixt|beyond|but|by|during|except|for|from|in|into|near|of|off|on|onto|out|over|since|till|to|under|until|unto|upon|with|de|du|da))(?:-|\\s+))a(?:-|\\s+)(.*))$'

DENOMINATOR_RE = '(?P<denominator>.+)( (per|a) .+)'

PARTITION_WORD_RE = '\\A(\\s*)(.+?)(\\s*)\\Z'

POSTFIX_ADJ_STEMS_RE = '^(?:((?:(?:(?!major|lieutenant|brigadier|adjutant|.*star)\\S+)(?=(?:-|\\s+)general))|(?:(?:court)(?=(?:-|\\s+)martial))|(?:(?:pound)(?=(?:-|\\s+)force)))(.*))$'

VERB_SPECIAL_S_RE = '^((?:(?:acropolis|aegis|alias|asbestos|bathos|bias|bronchitis|bursitis|caddis|cannabis|canvas|chaos|cosmos|dais|digitalis|epidermis|ethos|eyas|gas|glottis|hubris|ibis|lens|mantis|marquis|metropolis|pathos|pelvis|polis|rhinoceros|sassafras|trellis|ephemeris|iris|clitoris|chrysalis|epididymis|.*ss|.*us|.*itis|[A-Z].*es)|breeches|britches|pajamas|pyjamas|clippers|gallows|hijinks|headquarters|pliers|scissors|testes|herpes|pincers|shears|proceedings|trousers|cantus|coitus|nexus|contretemps|corps|debris|siemens|mumps|diabetes|jackanapes|series|species|subspecies|rabies|chassis|innings|news|mews|haggis|.*ois|.*measles|corpus|opus|genus|mythos|penis|testis|atlas|yes|(.*[csx])is|(.*)ceps|[A-Z].*s))$'

ADJ_SPECIAL_KEYS_RE = '^((?:a|an|this|that))$'

ADJ_POSS_KEYS_RE = '^((?:my|your|its|her|his|their))$'

ENDS_WITH_APOSTROPHE_S_RE = "^(.*)'s?$"

