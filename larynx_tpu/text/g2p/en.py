"""English (US) grapheme-to-phoneme: embedded lexicon + letter-to-sound rules.

Phoneme inventory matches the shipped en-us voices
(local/en-us/*/phonemes.txt): vowels aɪ aʊ eɪ i oʊ u æ ɑ ɔ ɔɪ ə ɚ ɛ ɪ ʊ ʌ,
consonants b d d͡ʒ f h j k l m n ŋ p s t t͡ʃ v w z ð ɡ ɹ ʃ ʒ θ; primary ˈ
and secondary ˌ stress are prefixed to the vowel symbol (split later by
phonemes_to_ids' ``separate`` handling).

Pronunciations for the embedded lexicon follow General American
conventions; OOV words fall through to an ordered rule engine.
"""

import re
import typing

# Lexicon: word -> space-separated phonemes (stress attached to the vowel).
_LEXICON_RAW = """
a ə
about ə b ˈaʊ t
above ə b ˈʌ v
across ə k ɹ ˈɔ s
act ˈæ k t
actually ˈæ k t͡ʃ u ə l i
add ˈæ d
after ˈæ f t ɚ
again ə ɡ ˈɛ n
against ə ɡ ˈɛ n s t
age ˈeɪ d͡ʒ
ago ə ɡ ˈoʊ
air ˈɛ ɹ
all ˈɔ l
almost ˈɔ l m oʊ s t
alone ə l ˈoʊ n
along ə l ˈɔ ŋ
already ɔ l ɹ ˈɛ d i
also ˈɔ l s oʊ
although ɔ l ð ˈoʊ
always ˈɔ l w eɪ z
am ˈæ m
among ə m ˈʌ ŋ
an ə n
and ə n d
animal ˈæ n ə m ə l
another ə n ˈʌ ð ɚ
answer ˈæ n s ɚ
any ˈɛ n i
anything ˈɛ n i θ ˌɪ ŋ
apple ˈæ p ə l
are ˈɑ ɹ
area ˈɛ ɹ i ə
arm ˈɑ ɹ m
around ɚ ˈaʊ n d
arthur ˈɑ ɹ θ ɚ
as ˈæ z
ask ˈæ s k
at ˈæ t
away ə w ˈeɪ
baby b ˈeɪ b i
back b ˈæ k
bad b ˈæ d
ball b ˈɔ l
be b ˈi
bear b ˈɛ ɹ
beautiful b j ˈu t ə f ə l
became b ɪ k ˈeɪ m
because b ɪ k ˈɔ z
become b ɪ k ˈʌ m
bed b ˈɛ d
been b ˈɪ n
before b ɪ f ˈɔ ɹ
began b ɪ ɡ ˈæ n
begin b ɪ ɡ ˈɪ n
behind b ɪ h ˈaɪ n d
beige b ˈeɪ ʒ
being b ˈi ɪ ŋ
believe b ɪ l ˈi v
below b ɪ l ˈoʊ
best b ˈɛ s t
better b ˈɛ t ɚ
between b ɪ t w ˈi n
big b ˈɪ ɡ
bird b ˈɚ d
black b l ˈæ k
blue b l ˈu
boat b ˈoʊ t
body b ˈɑ d i
book b ˈʊ k
both b ˈoʊ θ
box b ˈɑ k s
boy b ˈɔɪ
bring b ɹ ˈɪ ŋ
brought b ɹ ˈɔ t
build b ˈɪ l d
but b ˈʌ t
buy b ˈaɪ
by b ˈaɪ
cake k ˈeɪ k
call k ˈɔ l
came k ˈeɪ m
can k ˈæ n
cannot k ˈæ n ˌɑ t
car k ˈɑ ɹ
care k ˈɛ ɹ
carry k ˈæ ɹ i
cat k ˈæ t
catch k ˈæ t͡ʃ
cause k ˈɔ z
certain s ˈɚ t ə n
chance t͡ʃ ˈæ n s
change t͡ʃ ˈeɪ n d͡ʒ
check t͡ʃ ˈɛ k
child t͡ʃ ˈaɪ l d
children t͡ʃ ˈɪ l d ɹ ə n
city s ˈɪ t i
class k l ˈæ s
clear k l ˈɪ ɹ
close k l ˈoʊ s
cold k ˈoʊ l d
color k ˈʌ l ɚ
come k ˈʌ m
common k ˈɑ m ə n
complete k ə m p l ˈi t
computer k ə m p j ˈu t ɚ
could k ˈʊ d
country k ˈʌ n t ɹ i
course k ˈɔ ɹ s
cut k ˈʌ t
dark d ˈɑ ɹ k
dave d ˈeɪ v
day d ˈeɪ
deep d ˈi p
delicious d ɪ l ˈɪ ʃ ə s
develop d ɪ v ˈɛ l ə p
did d ˈɪ d
didn't d ˈɪ d ə n t
different d ˈɪ f ɹ ə n t
do d ˈu
does d ˈʌ z
dog d ˈɔ ɡ
don't d ˈoʊ n t
done d ˈʌ n
door d ˈɔ ɹ
down d ˈaʊ n
draw d ɹ ˈɔ
dry d ɹ ˈaɪ
during d ˈʊ ɹ ɪ ŋ
each ˈi t͡ʃ
early ˈɚ l i
earth ˈɚ θ
easy ˈi z i
eat ˈi t
echo ˈɛ k oʊ
eight ˈeɪ t
eighteen ˌeɪ t ˈi n
eighty ˈeɪ t i
either ˈi ð ɚ
eleven ɪ l ˈɛ v ə n
else ˈɛ l s
end ˈɛ n d
enough ɪ n ˈʌ f
even ˈi v ə n
evening ˈi v n ɪ ŋ
ever ˈɛ v ɚ
every ˈɛ v ɹ i
example ɪ ɡ z ˈæ m p ə l
eye ˈaɪ
face f ˈeɪ s
fact f ˈæ k t
family f ˈæ m ə l i
far f ˈɑ ɹ
fast f ˈæ s t
father f ˈɑ ð ɚ
feel f ˈi l
feet f ˈi t
fell f ˈɛ l
few f j ˈu
field f ˈi l d
fifteen f ˌɪ f t ˈi n
fifty f ˈɪ f t i
find f ˈaɪ n d
fine f ˈaɪ n
fire f ˈaɪ ɚ
first f ˈɚ s t
fish f ˈɪ ʃ
five f ˈaɪ v
fly f l ˈaɪ
follow f ˈɑ l oʊ
food f ˈu d
foot f ˈʊ t
for f ˈɔ ɹ
form f ˈɔ ɹ m
forty f ˈɔ ɹ t i
found f ˈaʊ n d
four f ˈɔ ɹ
fourteen f ˌɔ ɹ t ˈi n
free f ɹ ˈi
french f ɹ ˈɛ n t͡ʃ
friend f ɹ ˈɛ n d
from f ɹ ˈʌ m
front f ɹ ˈʌ n t
full f ˈʊ l
gave ɡ ˈeɪ v
get ɡ ˈɛ t
girl ɡ ˈɚ l
give ɡ ˈɪ v
go ɡ ˈoʊ
good ɡ ˈʊ d
got ɡ ˈɑ t
great ɡ ɹ ˈeɪ t
green ɡ ɹ ˈi n
ground ɡ ɹ ˈaʊ n d
group ɡ ɹ ˈu p
grow ɡ ɹ ˈoʊ
had h ˈæ d
half h ˈæ f
hand h ˈæ n d
happy h ˈæ p i
hard h ˈɑ ɹ d
has h ˈæ z
have h ˈæ v
he h ˈi
head h ˈɛ d
hear h ˈɪ ɹ
heard h ˈɚ d
heavy h ˈɛ v i
hello h ə l ˈoʊ
help h ˈɛ l p
her h ˈɚ
here h ˈɪ ɹ
high h ˈaɪ
him h ˈɪ m
his h ˈɪ z
hold h ˈoʊ l d
home h ˈoʊ m
horse h ˈɔ ɹ s
hot h ˈɑ t
hour ˈaʊ ɚ
house h ˈaʊ s
how h ˈaʊ
however h aʊ ˈɛ v ɚ
hue h j ˈu
hundred h ˈʌ n d ɹ ə d
i ˈaɪ
i'll ˈaɪ l
i'm ˈaɪ m
i've ˈaɪ v
idea aɪ d ˈi ə
if ˈɪ f
impressed ɪ m p ɹ ˈɛ s t
in ˈɪ n
including ɪ n k l ˈu d ɪ ŋ
into ˈɪ n t u
is ˈɪ z
it ˈɪ t
it's ˈɪ t s
its ˈɪ t s
just d͡ʒ ˈʌ s t
keep k ˈi p
kind k ˈaɪ n d
king k ˈɪ ŋ
knew n ˈu
know n ˈoʊ
known n ˈoʊ n
land l ˈæ n d
language l ˈæ ŋ ɡ w ə d͡ʒ
large l ˈɑ ɹ d͡ʒ
last l ˈæ s t
late l ˈeɪ t
later l ˈeɪ t ɚ
learn l ˈɚ n
leave l ˈi v
left l ˈɛ f t
less l ˈɛ s
let l ˈɛ t
letter l ˈɛ t ɚ
life l ˈaɪ f
light l ˈaɪ t
like l ˈaɪ k
line l ˈaɪ n
list l ˈɪ s t
listen l ˈɪ s ə n
little l ˈɪ t ə l
live l ˈɪ v
loch l ˈɑ k
long l ˈɔ ŋ
look l ˈʊ k
love l ˈʌ v
low l ˈoʊ
machine m ə ʃ ˈi n
made m ˈeɪ d
make m ˈeɪ k
man m ˈæ n
many m ˈɛ n i
may m ˈeɪ
me m ˈi
mean m ˈi n
men m ˈɛ n
might m ˈaɪ t
mile m ˈaɪ l
million m ˈɪ l j ə n
mind m ˈaɪ n d
minute m ˈɪ n ə t
miss m ˈɪ s
moist m ˈɔɪ s t
money m ˈʌ n i
month m ˈʌ n θ
moon m ˈu n
more m ˈɔ ɹ
morning m ˈɔ ɹ n ɪ ŋ
most m ˈoʊ s t
mother m ˈʌ ð ɚ
mountain m ˈaʊ n t ə n
move m ˈu v
much m ˈʌ t͡ʃ
music m j ˈu z ɪ k
must m ˈʌ s t
my m ˈaɪ
name n ˈeɪ m
near n ˈɪ ɹ
need n ˈi d
never n ˈɛ v ɚ
new n ˈu
next n ˈɛ k s t
night n ˈaɪ t
nine n ˈaɪ n
nineteen n ˈaɪ n t ˈi n
ninety n ˈaɪ n t i
no n ˈoʊ
north n ˈɔ ɹ θ
not n ˈɑ t
nothing n ˈʌ θ ɪ ŋ
november n oʊ v ˈɛ m b ɚ
now n ˈaʊ
number n ˈʌ m b ɚ
of ˈʌ v
off ˈɔ f
often ˈɔ f ə n
oh ˈoʊ
old ˈoʊ l d
on ˈɑ n
once w ˈʌ n s
one w ˈʌ n
only ˈoʊ n l i
open ˈoʊ p ə n
or ˈɔ ɹ
order ˈɔ ɹ d ɚ
other ˈʌ ð ɚ
our ˈaʊ ɚ
out ˈaʊ t
over ˈoʊ v ɚ
own ˈoʊ n
page p ˈeɪ d͡ʒ
paper p ˈeɪ p ɚ
part p ˈɑ ɹ t
people p ˈi p ə l
perhaps p ɚ h ˈæ p s
person p ˈɚ s ə n
picture p ˈɪ k t͡ʃ ɚ
piece p ˈi s
place p l ˈeɪ s
plant p l ˈæ n t
play p l ˈeɪ
point p ˈɔɪ n t
prior p ɹ ˈaɪ ɚ
put p ˈʊ t
queen k w ˈi n
question k w ˈɛ s t͡ʃ ə n
quick k w ˈɪ k
quickly k w ˈɪ k l i
quite k w ˈaɪ t
rain ɹ ˈeɪ n
ran ɹ ˈæ n
read ɹ ˈi d
ready ɹ ˈɛ d i
real ɹ ˈi l
really ɹ ˈɪ l i
red ɹ ˈɛ d
remember ɹ ɪ m ˈɛ m b ɚ
rest ɹ ˈɛ s t
right ɹ ˈaɪ t
river ɹ ˈɪ v ɚ
road ɹ ˈoʊ d
rock ɹ ˈɑ k
room ɹ ˈu m
round ɹ ˈaʊ n d
run ɹ ˈʌ n
said s ˈɛ d
same s ˈeɪ m
saw s ˈɔ
say s ˈeɪ
school s k ˈu l
sea s ˈi
second s ˈɛ k ə n d
see s ˈi
seem s ˈi m
seen s ˈi n
sentence s ˈɛ n t ə n s
set s ˈɛ t
seven s ˈɛ v ə n
seventeen s ˌɛ v ə n t ˈi n
seventy s ˈɛ v ə n t i
she ʃ ˈi
ship ʃ ˈɪ p
short ʃ ˈɔ ɹ t
should ʃ ˈʊ d
show ʃ ˈoʊ
side s ˈaɪ d
since s ˈɪ n s
sing s ˈɪ ŋ
six s ˈɪ k s
sixteen s ˌɪ k s t ˈi n
sixty s ˈɪ k s t i
sleep s l ˈi p
slow s l ˈoʊ
small s m ˈɔ l
so s ˈoʊ
some s ˈʌ m
something s ˈʌ m θ ɪ ŋ
song s ˈɔ ŋ
soon s ˈu n
sorry s ˈɑ ɹ i
sound s ˈaʊ n d
south s ˈaʊ θ
speak s p ˈi k
speech s p ˈi t͡ʃ
stand s t ˈæ n d
star s t ˈɑ ɹ
start s t ˈɑ ɹ t
state s t ˈeɪ t
stay s t ˈeɪ
still s t ˈɪ l
stop s t ˈɑ p
story s t ˈɔ ɹ i
street s t ɹ ˈi t
strong s t ɹ ˈɔ ŋ
study s t ˈʌ d i
such s ˈʌ t͡ʃ
sun s ˈʌ n
sure ʃ ˈʊ ɹ
symphony s ˈɪ m f ə n i
synthesis s ˈɪ n θ ə s ə s
system s ˈɪ s t ə m
take t ˈeɪ k
talk t ˈɔ k
tell t ˈɛ l
ten t ˈɛ n
test t ˈɛ s t
text t ˈɛ k s t
than ð ˈæ n
that ð ˈæ t
the ð ə
their ð ˈɛ ɹ
them ð ˈɛ m
then ð ˈɛ n
there ð ˈɛ ɹ
these ð ˈi z
they ð ˈeɪ
thing θ ˈɪ ŋ
think θ ˈɪ ŋ k
thirteen θ ˌɚ t ˈi n
thirty θ ˈɚ t i
this ð ˈɪ s
those ð ˈoʊ z
thought θ ˈɔ t
thousand θ ˈaʊ z ə n d
three θ ɹ ˈi
through θ ɹ ˈu
time t ˈaɪ m
to t ˈu
today t ə d ˈeɪ
together t ə ɡ ˈɛ ð ɚ
told t ˈoʊ l d
too t ˈu
took t ˈʊ k
top t ˈɑ p
toward t ə w ˈɔ ɹ d
town t ˈaʊ n
tree t ɹ ˈi
try t ɹ ˈaɪ
turn t ˈɚ n
twelve t w ˈɛ l v
twenty t w ˈɛ n t i
two t ˈu
under ˈʌ n d ɚ
until ə n t ˈɪ l
up ˈʌ p
upon ə p ˈɑ n
us ˈʌ s
use j ˈu z
used j ˈu z d
very v ˈɛ ɹ i
voice v ˈɔɪ s
wait w ˈeɪ t
walk w ˈɔ k
want w ˈɑ n t
wanted w ˈɑ n t ə d
warm w ˈɔ ɹ m
was w ˈʌ z
watch w ˈɑ t͡ʃ
water w ˈɔ t ɚ
waters w ˈɔ t ɚ z
way w ˈeɪ
we w ˈi
weather w ˈɛ ð ɚ
week w ˈi k
well w ˈɛ l
went w ˈɛ n t
were w ˈɚ
what w ˈʌ t
when w ˈɛ n
where w ˈɛ ɹ
which w ˈɪ t͡ʃ
while w ˈaɪ l
white w ˈaɪ t
who h ˈu
whole h ˈoʊ l
why w ˈaɪ
will w ˈɪ l
wind w ˈɪ n d
with w ˈɪ ð
without w ɪ θ ˈaʊ t
woman w ˈʊ m ə n
women w ˈɪ m ə n
word w ˈɚ d
words w ˈɚ d z
work w ˈɚ k
world w ˈɚ l d
would w ˈʊ d
write ɹ ˈaɪ t
year j ˈɪ ɹ
years j ˈɪ ɹ z
yes j ˈɛ s
yet j ˈɛ t
you j ˈu
young j ˈʌ ŋ
your j ˈɔ ɹ
zero z ˈɪ ɹ oʊ
afraid ə f ɹ ˈeɪ d
can't k ˈæ n t
silent s ˈaɪ l ə n t
going ɡ ˈoʊ ɪ ŋ
"""

LEXICON: typing.Dict[str, typing.List[str]] = {}
for _line in _LEXICON_RAW.strip().splitlines():
    _parts = _line.split()
    LEXICON[_parts[0]] = _parts[1:]


# -----------------------------------------------------------------------------
# Letter-to-sound rules for OOV words.  Ordered longest-match rules over the
# lowercase spelling; crude but keeps every word speakable.

_RULES: typing.List[typing.Tuple[str, str]] = [
    # multi-letter graphemes first
    ("tion", "ʃ ə n"),
    ("sion", "ʒ ə n"),
    ("ought", "ˈɔ t"),
    ("aught", "ˈɔ t"),
    ("eigh", "ˈeɪ"),
    ("igh", "ˈaɪ"),
    ("tch", "t͡ʃ"),
    ("dge", "d͡ʒ"),
    ("sch", "s k"),
    ("ing", "ɪ ŋ"),
    ("qu", "k w"),
    ("th", "θ"),
    ("sh", "ʃ"),
    ("ch", "t͡ʃ"),
    ("ph", "f"),
    ("wh", "w"),
    ("ck", "k"),
    ("ng", "ŋ"),
    ("gh", "ɡ"),
    ("wr", "ɹ"),
    ("kn", "n"),
    ("oo", "ˈu"),
    ("ee", "ˈi"),
    ("ea", "ˈi"),
    ("ai", "ˈeɪ"),
    ("ay", "ˈeɪ"),
    ("oa", "ˈoʊ"),
    ("ow", "ˈoʊ"),
    ("ou", "ˈaʊ"),
    ("oi", "ˈɔɪ"),
    ("oy", "ˈɔɪ"),
    ("au", "ˈɔ"),
    ("aw", "ˈɔ"),
    ("ew", "ˈu"),
    ("ey", "ˈi"),
    ("ie", "ˈi"),
    ("ue", "ˈu"),
    ("ar", "ˈɑ ɹ"),
    ("er", "ɚ"),
    ("ir", "ˈɚ"),
    ("or", "ˈɔ ɹ"),
    ("ur", "ˈɚ"),
    # single letters
    ("a", "æ"),
    ("b", "b"),
    ("c", "k"),
    ("d", "d"),
    ("e", "ɛ"),
    ("f", "f"),
    ("g", "ɡ"),
    ("h", "h"),
    ("i", "ɪ"),
    ("j", "d͡ʒ"),
    ("k", "k"),
    ("l", "l"),
    ("m", "m"),
    ("n", "n"),
    ("o", "ɑ"),
    ("p", "p"),
    ("r", "ɹ"),
    ("s", "s"),
    ("t", "t"),
    ("u", "ʌ"),
    ("v", "v"),
    ("w", "w"),
    ("x", "k s"),
    ("y", "i"),
    ("z", "z"),
]

_VOWEL_SYMBOLS = {
    "aɪ", "aʊ", "eɪ", "i", "oʊ", "u", "æ", "ɑ", "ɔ", "ɔɪ", "ə", "ɚ", "ɛ",
    "ɪ", "ʊ", "ʌ",
}

# letters that should be spelled out (acronyms, single letters)
_LETTER_NAMES = {
    "a": ["ˈeɪ"], "b": ["b", "ˈi"], "c": ["s", "ˈi"], "d": ["d", "ˈi"],
    "e": ["ˈi"], "f": ["ˈɛ", "f"], "g": ["d͡ʒ", "ˈi"], "h": ["ˈeɪ", "t͡ʃ"],
    "i": ["ˈaɪ"], "j": ["d͡ʒ", "ˈeɪ"], "k": ["k", "ˈeɪ"], "l": ["ˈɛ", "l"],
    "m": ["ˈɛ", "m"], "n": ["ˈɛ", "n"], "o": ["ˈoʊ"], "p": ["p", "ˈi"],
    "q": ["k", "j", "ˈu"], "r": ["ˈɑ", "ɹ"], "s": ["ˈɛ", "s"],
    "t": ["t", "ˈi"], "u": ["j", "ˈu"], "v": ["v", "ˈi"],
    "w": ["d", "ˈʌ", "b", "ə", "l", "j", "u"], "x": ["ˈɛ", "k", "s"],
    "y": ["w", "ˈaɪ"], "z": ["z", "ˈi"],
}


def _apply_rules(word: str) -> typing.List[str]:
    out: typing.List[str] = []
    i = 0
    n = len(word)
    # final silent e ("make", "time") with magic-e vowel lengthening
    magic_e = bool(re.search(r"[bcdfgklmnprstvz]e$", word)) and n > 3
    body = word[:-1] if magic_e else word
    if magic_e:
        body_vowels = {"a": "ˈeɪ", "i": "ˈaɪ", "o": "ˈoʊ", "u": "ˈu", "e": "ˈi"}
    while i < len(body):
        for pattern, phones in _RULES:
            if body.startswith(pattern, i):
                # magic-e: the last single vowel before final consonant says
                # its name
                if (
                    magic_e
                    and pattern in ("a", "e", "i", "o", "u")
                    and i >= len(body) - 2
                ):
                    out.extend(body_vowels[pattern].split())
                else:
                    out.extend(phones.split())
                i += len(pattern)
                break
        else:
            i += 1  # unknown character: skip
    return out


def _ensure_stress(phonemes: typing.List[str]) -> typing.List[str]:
    """Guarantee exactly one primary stress on the first vowel if none."""
    if any(p.startswith("ˈ") or p.startswith("ˌ") for p in phonemes):
        return phonemes
    out = list(phonemes)
    for i, p in enumerate(out):
        if p in _VOWEL_SYMBOLS:
            out[i] = "ˈ" + p
            break
    return out


def phonemize(word: str) -> typing.List[str]:
    w = word.lower().strip()
    if not w:
        return []
    if w in LEXICON:
        return list(LEXICON[w])

    # possessive / plural: stem + s
    if w.endswith("'s") and w[:-2] in LEXICON:
        stem = list(LEXICON[w[:-2]])
        last = stem[-1]
        if last in {"s", "z", "ʃ", "ʒ", "t͡ʃ", "d͡ʒ"}:
            return stem + ["ə", "z"]
        if last in {"p", "t", "k", "f", "θ"}:
            return stem + ["s"]
        return stem + ["z"]
    if w.endswith("s") and w[:-1] in LEXICON:
        stem = list(LEXICON[w[:-1]])
        last = stem[-1]
        if last in {"s", "z", "ʃ", "ʒ", "t͡ʃ", "d͡ʒ"}:
            return stem + ["ə", "z"]
        if last in {"p", "t", "k", "f", "θ"}:
            return stem + ["s"]
        return stem + ["z"]
    # -ed past tense
    if w.endswith("ed") and w[:-2] in LEXICON:
        stem = list(LEXICON[w[:-2]])
        last = stem[-1]
        if last in {"t", "d"}:
            return stem + ["ə", "d"]
        if last in {"p", "k", "f", "θ", "s", "ʃ", "t͡ʃ"}:
            return stem + ["t"]
        return stem + ["d"]
    # -ly adverbs
    if w.endswith("ly") and w[:-2] in LEXICON:
        return list(LEXICON[w[:-2]]) + ["l", "i"]
    # -ing forms
    if w.endswith("ing") and w[:-3] in LEXICON:
        return list(LEXICON[w[:-3]]) + ["ɪ", "ŋ"]
    if w.endswith("ing") and len(w) > 4 and w[:-3] + "e" in LEXICON:
        return list(LEXICON[w[:-3] + "e"]) + ["ɪ", "ŋ"]

    if len(w) == 1 and w in _LETTER_NAMES:
        return list(_LETTER_NAMES[w])
    # all-caps acronym heuristic: spell out short consonant clusters
    if len(w) <= 4 and word.isupper() and not any(c in "aeiou" for c in w):
        out: typing.List[str] = []
        for ch in w:
            out.extend(_LETTER_NAMES.get(ch, []))
        return out

    return _ensure_stress(_apply_rules(w))
