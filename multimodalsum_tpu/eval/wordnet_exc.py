"""Curated WordNet irregular-forms table for py-rouge-compatible stemming.

py-rouge's ``Rouge.stem_tokens`` (the stemmer the reference's ROUGE protocol
uses, ``src/test.py:19-26``) looks each token longer than 3 characters up in
a WordNet exception table (``wordnet_key_value.txt``, derived from WordNet's
``noun.exc``/``verb.exc``/``adj.exc`` morphy exception files) and, on a hit,
replaces the token with its base form INSTEAD of Porter-stemming it
('children' -> 'child', 'brought' -> 'bring').

That data file ships inside the py-rouge package, which is not installed in
this offline environment, so the table below is CURATED from the well-known
WordNet irregular inflections: every irregular noun plural, verb past /
past-participle, and adjective comparative/superlative likely to occur in
review text (the Yelp/Amazon eval corpora). Keys are lowercase and all
longer than 3 chars (shorter tokens never reach the lookup). Entries whose
key maps to different lemmas in different WordNet POS files (py-rouge's
generator collapsed those to a single value we cannot observe offline) carry
a comment; for them we pick the dominant reading. See PARITY.md.
"""

_PAIRS = """
arose arise
arisen arise
awoke awake
awoken awake
beaten beat
became become
began begin
begun begin
bent bend
bitten bite
bled bleed
blew blow
blown blow
bore bear
born bear
borne bear
bought buy
bound bind
bred breed
broke break
broken break
brought bring
built build
burnt burn
came come
caught catch
chose choose
chosen choose
clung cling
crept creep
dealt deal
done do
drank drink
drawn draw
dreamt dream
drew draw
driven drive
drove drive
drunk drink
eaten eat
fallen fall
fell fall
felt feel
fled flee
flew fly
flown fly
flung fling
forbade forbid
forbidden forbid
forgave forgive
forgiven forgive
forgot forget
forgotten forget
fought fight
found find
froze freeze
frozen freeze
gave give
given give
gone go
gotten get
grew grow
ground grind
grown grow
heard hear
held hold
hidden hide
hung hang
kept keep
knelt kneel
knew know
known know
laid lay
lain lie
leant lean
leapt leap
learnt learn
left leave
lent lend
lost lose
made make
meant mean
misled mislead
mistaken mistake
mistook mistake
misunderstood misunderstand
mimicked mimic
outdone outdo
overate overeat
overcame overcome
overdone overdo
overheard overhear
overseen oversee
oversaw oversee
overtaken overtake
overthrew overthrow
overthrown overthrow
overtook overtake
paid pay
panicked panic
picnicked picnic
proven prove
rang ring
rebuilt rebuild
redone redo
remade remake
repaid repay
reran rerun
resold resell
rethought rethink
retold retell
rewound rewind
rewritten rewrite
rewrote rewrite
ridden ride
risen rise
rode ride
rose rise
rung ring
said say
sang sing
sank sink
seen see
sent send
shaken shake
shone shine
shook shake
shot shoot
shown show
shrank shrink
shrunk shrink
slain slay
slept sleep
slew slay
slid slide
slung sling
sold sell
sought seek
sped speed
spelt spell
spent spend
spilt spill
spoilt spoil
spoke speak
spoken speak
sprang spring
sprung spring
stank stink
stole steal
stolen steal
stood stand
strode stride
strove strive
striven strive
struck strike
strung string
stuck stick
stung sting
stunk stink
sung sing
sunk sink
swam swim
swept sweep
swore swear
sworn swear
swum swim
swung swing
taken take
taught teach
thought think
threw throw
thrown throw
told tell
took take
tore tear
torn tear
trod tread
trodden tread
undergone undergo
understood understand
undertaken undertake
undertook undertake
underwent undergo
undid undo
undone undo
unwound unwind
upheld uphold
went go
wept weep
were be
been be
withdrawn withdraw
withdrew withdraw
withheld withhold
withstood withstand
woke wake
woken wake
wore wear
worn wear
wove weave
woven weave
written write
wrote write
wrung wring
alumni alumnus
analyses analysis
antennae antenna
appendices appendix
bacteria bacterium
bases basis
brethren brother
businessmen businessman
cacti cactus
calves calf
chairmen chairman
children child
congressmen congressman
corpora corpus
countrymen countryman
craftsmen craftsman
crises crisis
criteria criterion
curricula curriculum
data datum
diagnoses diagnosis
dice die
dwarves dwarf
elves elf
feet foot
firemen fireman
fishermen fisherman
foci focus
foremen foreman
formulae formula
freshmen freshman
fungi fungus
geese goose
genera genus
gentlemen gentleman
gunmen gunman
halves half
hooves hoof
horsemen horseman
housewives housewife
hypotheses hypothesis
indices index
knives knife
larvae larva
lice louse
lives life
loaves loaf
madmen madman
matrices matrix
memoranda memorandum
mice mouse
middlemen middleman
midwives midwife
nuclei nucleus
oases oasis
oxen ox
parentheses parenthesis
pence penny
phenomena phenomenon
policemen policeman
radii radius
salesmen salesman
scarves scarf
selves self
servicemen serviceman
sheaves sheaf
shelves shelf
snowmen snowman
spokesmen spokesman
sportsmen sportsman
statesmen statesman
stimuli stimulus
syllabi syllabus
syntheses synthesis
teeth tooth
theses thesis
thieves thief
vertices vertex
vortices vortex
watchmen watchman
wharves wharf
wives wife
wolves wolf
women woman
workmen workman
bigger big
biggest big
farther far
farthest far
fatter fat
fattest fat
fitter fit
fittest fit
further far
furthest far
hotter hot
hottest hot
sadder sad
saddest sad
thinner thin
thinnest thin
wetter wet
wettest wet
"""

# Cross-POS keys whose single collapsed value in py-rouge's shipped file is
# unobservable offline — we pick the dominant review-text reading (see
# module docstring). Either choice matches py-rouge whenever hypothesis and
# reference use the SAME surface form (both sides map identically).
_AMBIGUOUS_PAIRS = """
leaves leaf
better good
best good
worse bad
worst bad
"""


def _parse(block: str) -> dict:
    table = {}
    for line in block.strip().splitlines():
        k, v = line.split()
        assert k not in table, f"duplicate key {k!r}"
        assert len(k) > 3, f"key {k!r} never reaches the len>3 lookup"
        table[k] = v
    return table


WORDNET_EXCEPTIONS: dict = {**_parse(_PAIRS), **_parse(_AMBIGUOUS_PAIRS)}
