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
able ˈeɪ b ə l
accept æ k s ˈɛ p t
access ˈæ k s ɛ s
account ə k ˈaʊ n t
action ˈæ k ʃ ə n
active ˈæ k t ɪ v
address ə d ˈɹ ɛ s
admit æ d m ˈɪ t
adult ə d ˈʌ l t
affect ə f ˈɛ k t
afternoon ˌæ f t ɚ n ˈu n
agency ˈeɪ d͡ʒ ə n s i
agent ˈeɪ d͡ʒ ə n t
agree ə ɡ ˈɹ i
ahead ə h ˈɛ d
allow ə l ˈaʊ
alright ɔ l ɹ ˈaɪ t
amazing ə m ˈeɪ z ɪ ŋ
america ə m ˈɛ ɹ ɪ k ə
american ə m ˈɛ ɹ ɪ k ə n
amount ə m ˈaʊ n t
analysis ə n ˈæ l ə s ə s
ancient ˈeɪ n ʃ ə n t
anger ˈæ ŋ ɡ ɚ
angle ˈæ ŋ ɡ ə l
angry ˈæ ŋ ɡ ɹ i
announce ə n ˈaʊ n s
annual ˈæ n j u ə l
anybody ˈɛ n i b ˌɑ d i
anymore ˌɛ n i m ˈɔ ɹ
anyone ˈɛ n i w ˌʌ n
anyway ˈɛ n i w ˌeɪ
anywhere ˈɛ n i w ˌɛ ɹ
apart ə p ˈɑ ɹ t
apartment ə p ˈɑ ɹ t m ə n t
appear ə p ˈɪ ɹ
application ˌæ p l ə k ˈeɪ ʃ ə n
apply ə p l ˈaɪ
approach ə p ˈɹ oʊ t͡ʃ
april ˈeɪ p ɹ ə l
argue ˈɑ ɹ ɡ j u
argument ˈɑ ɹ ɡ j ə m ə n t
arrive ɚ ˈaɪ v
art ˈɑ ɹ t
article ˈɑ ɹ t ɪ k ə l
artist ˈɑ ɹ t ə s t
attack ə t ˈæ k
attempt ə t ˈɛ m p t
attention ə t ˈɛ n ʃ ə n
audio ˈɔ d i ˌoʊ
august ˈɔ ɡ ə s t
author ˈɔ θ ɚ
available ə v ˈeɪ l ə b ə l
average ˈæ v ɹ ə d͡ʒ
avoid ə v ˈɔɪ d
aware ə w ˈɛ ɹ
bag b ˈæ ɡ
balance b ˈæ l ə n s
band b ˈæ n d
bank b ˈæ ŋ k
bar b ˈɑ ɹ
base b ˈeɪ s
basic b ˈeɪ s ɪ k
basis b ˈeɪ s ə s
battle b ˈæ t ə l
beach b ˈi t͡ʃ
beat b ˈi t
beauty b j ˈu t i
becomes b ɪ k ˈʌ m z
beginning b ɪ ɡ ˈɪ n ɪ ŋ
behavior b ɪ h ˈeɪ v j ɚ
bell b ˈɛ l
belong b ɪ l ˈɔ ŋ
beneath b ɪ n ˈi θ
benefit b ˈɛ n ə f ɪ t
beside b ɪ s ˈaɪ d
besides b ɪ s ˈaɪ d z
beyond b i ˈɑ n d
bill b ˈɪ l
billion b ˈɪ l j ə n
bit b ˈɪ t
block b l ˈɑ k
blood b l ˈʌ d
board b ˈɔ ɹ d
bone b ˈoʊ n
border b ˈɔ ɹ d ɚ
born b ˈɔ ɹ n
bottle b ˈɑ t ə l
bottom b ˈɑ t ə m
brain b ɹ ˈeɪ n
branch b ɹ ˈæ n t͡ʃ
bread b ɹ ˈɛ d
break b ɹ ˈeɪ k
breakfast b ɹ ˈɛ k f ə s t
breath b ɹ ˈɛ θ
breathe b ɹ ˈi ð
bridge b ɹ ˈɪ d͡ʒ
brief b ɹ ˈi f
bright b ɹ ˈaɪ t
brother b ɹ ˈʌ ð ɚ
brown b ɹ ˈaʊ n
budget b ˈʌ d͡ʒ ə t
building b ˈɪ l d ɪ ŋ
burn b ˈɚ n
business b ˈɪ z n ə s
busy b ˈɪ z i
button b ˈʌ t ə n
camera k ˈæ m ɹ ə
campaign k æ m p ˈeɪ n
cancer k ˈæ n s ɚ
candidate k ˈæ n d ə d ə t
capital k ˈæ p ə t ə l
captain k ˈæ p t ə n
card k ˈɑ ɹ d
career k ɚ ˈɪ ɹ
careful k ˈɛ ɹ f ə l
cast k ˈæ s t
cell s ˈɛ l
center s ˈɛ n t ɚ
central s ˈɛ n t ɹ ə l
century s ˈɛ n t͡ʃ ɚ i
ceremony s ˈɛ ɹ ə m ˌoʊ n i
chair t͡ʃ ˈɛ ɹ
challenge t͡ʃ ˈæ l ə n d͡ʒ
champion t͡ʃ ˈæ m p i ə n
character k ˈɛ ɹ ə k t ɚ
charge t͡ʃ ˈɑ ɹ d͡ʒ
chart t͡ʃ ˈɑ ɹ t
cheap t͡ʃ ˈi p
chicken t͡ʃ ˈɪ k ə n
chief t͡ʃ ˈi f
choice t͡ʃ ˈɔɪ s
choose t͡ʃ ˈu z
chose t͡ʃ ˈoʊ z
church t͡ʃ ˈɚ t͡ʃ
circle s ˈɚ k ə l
citizen s ˈɪ t ə z ə n
claim k l ˈeɪ m
clean k l ˈi n
click k l ˈɪ k
climb k l ˈaɪ m
clock k l ˈɑ k
closed k l ˈoʊ z d
clothes k l ˈoʊ z
cloud k l ˈaʊ d
club k l ˈʌ b
coach k ˈoʊ t͡ʃ
coast k ˈoʊ s t
coffee k ˈɔ f i
collect k ə l ˈɛ k t
college k ˈɑ l ɪ d͡ʒ
command k ə m ˈæ n d
comment k ˈɑ m ɛ n t
community k ə m j ˈu n ə t i
company k ˈʌ m p ə n i
compare k ə m p ˈɛ ɹ
computer k ə m p j ˈu t ɚ
concern k ə n s ˈɚ n
condition k ə n d ˈɪ ʃ ə n
conference k ˈɑ n f ɹ ə n s
congress k ˈɑ ŋ ɡ ɹ ə s
connect k ə n ˈɛ k t
consider k ə n s ˈɪ d ɚ
contain k ə n t ˈeɪ n
continue k ə n t ˈɪ n j u
control k ə n t ɹ ˈoʊ l
conversation k ˌɑ n v ɚ s ˈeɪ ʃ ə n
cook k ˈʊ k
cool k ˈu l
copy k ˈɑ p i
corn k ˈɔ ɹ n
corner k ˈɔ ɹ n ɚ
correct k ɚ ˈɛ k t
cost k ˈɔ s t
cotton k ˈɑ t ə n
couch k ˈaʊ t͡ʃ
couple k ˈʌ p ə l
courage k ˈɚ ə d͡ʒ
court k ˈɔ ɹ t
cover k ˈʌ v ɚ
cow k ˈaʊ
create k ɹ i ˈeɪ t
credit k ˈɹ ɛ d ə t
crew k ɹ ˈu
crime k ɹ ˈaɪ m
cross k ɹ ˈɔ s
crowd k ɹ ˈaʊ d
cry k ɹ ˈaɪ
culture k ˈʌ l t͡ʃ ɚ
cup k ˈʌ p
current k ˈɚ ə n t
customer k ˈʌ s t ə m ɚ
cycle s ˈaɪ k ə l
damage d ˈæ m ə d͡ʒ
dance d ˈæ n s
danger d ˈeɪ n d͡ʒ ɚ
data d ˈeɪ t ə
date d ˈeɪ t
daughter d ˈɔ t ɚ
dead d ˈɛ d
deal d ˈi l
dear d ˈɪ ɹ
death d ˈɛ θ
debate d ə b ˈeɪ t
december d ɪ s ˈɛ m b ɚ
decide d ə s ˈaɪ d
decision d ə s ˈɪ ʒ ə n
deep d ˈi p
defense d ɪ f ˈɛ n s
degree d ɪ ɡ ˈɹ i
demand d ɪ m ˈæ n d
democracy d ɪ m ˈɑ k ɹ ə s i
describe d ɪ s k ˈɹ aɪ b
design d ɪ z ˈaɪ n
desk d ˈɛ s k
despite d ɪ s p ˈaɪ t
detail d ˈi t eɪ l
determine d ɪ t ˈɚ m ə n
device d ɪ v ˈaɪ s
dialogue d ˈaɪ ə l ˌɔ ɡ
dictionary d ˈɪ k ʃ ə n ˌɛ ɹ i
die d ˈaɪ
difference d ˈɪ f ɹ ə n s
difficult d ˈɪ f ə k ə l t
digital d ˈɪ d͡ʒ ə t ə l
dinner d ˈɪ n ɚ
direction d ɚ ˈɛ k ʃ ə n
director d ɚ ˈɛ k t ɚ
discover d ɪ s k ˈʌ v ɚ
discuss d ɪ s k ˈʌ s
discussion d ɪ s k ˈʌ ʃ ə n
disease d ɪ z ˈi z
distance d ˈɪ s t ə n s
doctor d ˈɑ k t ɚ
document d ˈɑ k j ə m ə n t
dollar d ˈɑ l ɚ
double d ˈʌ b ə l
doubt d ˈaʊ t
dozen d ˈʌ z ə n
dream d ɹ ˈi m
dress d ɹ ˈɛ s
drink d ɹ ˈɪ ŋ k
drive d ɹ ˈaɪ v
driver d ɹ ˈaɪ v ɚ
drop d ɹ ˈɑ p
drug d ɹ ˈʌ ɡ
due d ˈu
dust d ˈʌ s t
duty d ˈu t i
eastern ˈi s t ɚ n
economy ɪ k ˈɑ n ə m i
edge ˈɛ d͡ʒ
education ˌɛ d͡ʒ ə k ˈeɪ ʃ ə n
effect ɪ f ˈɛ k t
effort ˈɛ f ɚ t
egg ˈɛ ɡ
election ɪ l ˈɛ k ʃ ə n
electric ɪ l ˈɛ k t ɹ ɪ k
email ˈi m eɪ l
emergency ɪ m ˈɚ d͡ʒ ə n s i
emotion ɪ m ˈoʊ ʃ ə n
employee ɛ m p l ˈɔɪ i
empty ˈɛ m p t i
energy ˈɛ n ɚ d͡ʒ i
engine ˈɛ n d͡ʒ ə n
english ˈɪ ŋ ɡ l ɪ ʃ
enjoy ɛ n d͡ʒ ˈɔɪ
enter ˈɛ n t ɚ
entire ɛ n t ˈaɪ ɚ
environment ɛ n v ˈaɪ ɹ ə n m ə n t
equal ˈi k w ə l
equipment ɪ k w ˈɪ p m ə n t
error ˈɛ ɹ ɚ
escape ɪ s k ˈeɪ p
especially ɪ s p ˈɛ ʃ ə l i
establish ɪ s t ˈæ b l ɪ ʃ
europe j ˈʊ ɹ ə p
event ɪ v ˈɛ n t
everybody ˈɛ v ɹ i b ˌɑ d i
everyone ˈɛ v ɹ i w ˌʌ n
everything ˈɛ v ɹ i θ ˌɪ ŋ
everywhere ˈɛ v ɹ i w ˌɛ ɹ
evidence ˈɛ v ə d ə n s
exact ɪ ɡ z ˈæ k t
exactly ɪ ɡ z ˈæ k t l i
examine ɪ ɡ z ˈæ m ə n
excellent ˈɛ k s ə l ə n t
except ɪ k s ˈɛ p t
exchange ɪ k s t͡ʃ ˈeɪ n d͡ʒ
excite ɪ k s ˈaɪ t
exercise ˈɛ k s ɚ s ˌaɪ z
exist ɪ ɡ z ˈɪ s t
expect ɪ k s p ˈɛ k t
expensive ɪ k s p ˈɛ n s ɪ v
experience ɪ k s p ˈɪ ɹ i ə n s
experiment ɪ k s p ˈɛ ɹ ə m ə n t
expert ˈɛ k s p ɚ t
explain ɪ k s p l ˈeɪ n
express ɪ k s p ˈɹ ɛ s
extra ˈɛ k s t ɹ ə
face f ˈeɪ s
factor f ˈæ k t ɚ
factory f ˈæ k t ɚ i
fail f ˈeɪ l
fair f ˈɛ ɹ
faith f ˈeɪ θ
fall f ˈɔ l
false f ˈɔ l s
familiar f ə m ˈɪ l j ɚ
famous f ˈeɪ m ə s
fan f ˈæ n
farm f ˈɑ ɹ m
farmer f ˈɑ ɹ m ɚ
fashion f ˈæ ʃ ə n
fat f ˈæ t
fear f ˈɪ ɹ
feature f ˈi t͡ʃ ɚ
february f ˈɛ b j u ˌɛ ɹ i
federal f ˈɛ d ɚ ə l
feed f ˈi d
feeling f ˈi l ɪ ŋ
fight f ˈaɪ t
figure f ˈɪ ɡ j ɚ
file f ˈaɪ l
fill f ˈɪ l
film f ˈɪ l m
final f ˈaɪ n ə l
finally f ˈaɪ n ə l i
finance f ə n ˈæ n s
finger f ˈɪ ŋ ɡ ɚ
finish f ˈɪ n ɪ ʃ
firm f ˈɚ m
fit f ˈɪ t
fix f ˈɪ k s
flat f l ˈæ t
flight f l ˈaɪ t
floor f l ˈɔ ɹ
flow f l ˈoʊ
flower f l ˈaʊ ɚ
focus f ˈoʊ k ə s
forest f ˈɔ ɹ ə s t
forever f ɚ ˈɛ v ɚ
forget f ɚ ɡ ˈɛ t
forward f ˈɔ ɹ w ɚ d
frame f ɹ ˈeɪ m
france f ɹ ˈæ n s
fresh f ɹ ˈɛ ʃ
friday f ɹ ˈaɪ d eɪ
fruit f ɹ ˈu t
fun f ˈʌ n
function f ˈʌ ŋ k ʃ ə n
fund f ˈʌ n d
future f j ˈu t͡ʃ ɚ
game ɡ ˈeɪ m
garden ɡ ˈɑ ɹ d ə n
gas ɡ ˈæ s
gather ɡ ˈæ ð ɚ
general d͡ʒ ˈɛ n ɚ ə l
generation d͡ʒ ˌɛ n ɚ ˈeɪ ʃ ə n
gentle d͡ʒ ˈɛ n t ə l
german d͡ʒ ˈɚ m ə n
germany d͡ʒ ˈɚ m ə n i
gift ɡ ˈɪ f t
glad ɡ l ˈæ d
glass ɡ l ˈæ s
global ɡ l ˈoʊ b ə l
goal ɡ ˈoʊ l
god ɡ ˈɑ d
gold ɡ ˈoʊ l d
gone ɡ ˈɔ n
government ɡ ˈʌ v ɚ n m ə n t
grand ɡ ɹ ˈæ n d
grass ɡ ɹ ˈæ s
gray ɡ ɹ ˈeɪ
grew ɡ ɹ ˈu
ground ɡ ɹ ˈaʊ n d
growth ɡ ɹ ˈoʊ θ
guard ɡ ˈɑ ɹ d
guess ɡ ˈɛ s
guest ɡ ˈɛ s t
guide ɡ ˈaɪ d
gun ɡ ˈʌ n
guy ɡ ˈaɪ
hair h ˈɛ ɹ
hall h ˈɔ l
handle h ˈæ n d ə l
hang h ˈæ ŋ
happen h ˈæ p ə n
happened h ˈæ p ə n d
harm h ˈɑ ɹ m
hate h ˈeɪ t
health h ˈɛ l θ
hearing h ˈɪ ɹ ɪ ŋ
heart h ˈɑ ɹ t
heat h ˈi t
herself h ɚ s ˈɛ l f
hide h ˈaɪ d
highway h ˈaɪ w eɪ
hill h ˈɪ l
himself h ɪ m s ˈɛ l f
history h ˈɪ s t ɚ i
hit h ˈɪ t
hole h ˈoʊ l
holiday h ˈɑ l ə d ˌeɪ
honest ˈɑ n ə s t
hope h ˈoʊ p
hospital h ˈɑ s p ɪ t ə l
host h ˈoʊ s t
hotel h oʊ t ˈɛ l
huge h j ˈu d͡ʒ
human h j ˈu m ə n
hurt h ˈɚ t
husband h ˈʌ z b ə n d
ice ˈaɪ s
image ˈɪ m ə d͡ʒ
imagine ɪ m ˈæ d͡ʒ ə n
impact ˈɪ m p æ k t
important ɪ m p ˈɔ ɹ t ə n t
improve ɪ m p ˈɹ u v
inch ˈɪ n t͡ʃ
increase ɪ n k ˈɹ i s
indeed ɪ n d ˈi d
industry ˈɪ n d ə s t ɹ i
information ˌɪ n f ɚ m ˈeɪ ʃ ə n
inside ɪ n s ˈaɪ d
instance ˈɪ n s t ə n s
instead ɪ n s t ˈɛ d
institution ˌɪ n s t ə t ˈu ʃ ə n
interest ˈɪ n t ɹ ə s t
interesting ˈɪ n t ɹ ə s t ɪ ŋ
international ˌɪ n t ɚ n ˈæ ʃ ə n ə l
internet ˈɪ n t ɚ n ˌɛ t
interview ˈɪ n t ɚ v j ˌu
introduce ˌɪ n t ɹ ə d ˈu s
investment ɪ n v ˈɛ s t m ə n t
involve ɪ n v ˈɑ l v
iron ˈaɪ ɚ n
island ˈaɪ l ə n d
issue ˈɪ ʃ u
item ˈaɪ t ə m
itself ɪ t s ˈɛ l f
january d͡ʒ ˈæ n j u ˌɛ ɹ i
job d͡ʒ ˈɑ b
join d͡ʒ ˈɔɪ n
joke d͡ʒ ˈoʊ k
journey d͡ʒ ˈɚ n i
joy d͡ʒ ˈɔɪ
judge d͡ʒ ˈʌ d͡ʒ
july d͡ʒ u l ˈaɪ
jump d͡ʒ ˈʌ m p
june d͡ʒ ˈu n
key k ˈi
kick k ˈɪ k
kid k ˈɪ d
kill k ˈɪ l
kitchen k ˈɪ t͡ʃ ə n
knee n ˈi
knife n ˈaɪ f
knock n ˈɑ k
knowledge n ˈɑ l ɪ d͡ʒ
lack l ˈæ k
lady l ˈeɪ d i
lake l ˈeɪ k
laugh l ˈæ f
law l ˈɔ
lawyer l ˈɔɪ ɚ
lay l ˈeɪ
lead l ˈi d
leader l ˈi d ɚ
leg l ˈɛ ɡ
legal l ˈi ɡ ə l
lesson l ˈɛ s ə n
level l ˈɛ v ə l
library l ˈaɪ b ɹ ˌɛ ɹ i
lie l ˈaɪ
limit l ˈɪ m ə t
link l ˈɪ ŋ k
lip l ˈɪ p
local l ˈoʊ k ə l
lock l ˈɑ k
lonely l ˈoʊ n l i
lose l ˈu z
loss l ˈɔ s
lost l ˈɔ s t
loud l ˈaʊ d
lucky l ˈʌ k i
lunch l ˈʌ n t͡ʃ
mail m ˈeɪ l
main m ˈeɪ n
maintain m eɪ n t ˈeɪ n
major m ˈeɪ d͡ʒ ɚ
majority m ə d͡ʒ ˈɔ ɹ ə t i
manage m ˈæ n ə d͡ʒ
manager m ˈæ n ə d͡ʒ ɚ
march m ˈɑ ɹ t͡ʃ
mark m ˈɑ ɹ k
market m ˈɑ ɹ k ə t
marriage m ˈɛ ɹ ɪ d͡ʒ
marry m ˈɛ ɹ i
mass m ˈæ s
master m ˈæ s t ɚ
match m ˈæ t͡ʃ
material m ə t ˈɪ ɹ i ə l
matter m ˈæ t ɚ
maybe m ˈeɪ b i
meal m ˈi l
measure m ˈɛ ʒ ɚ
meat m ˈi t
media m ˈi d i ə
medical m ˈɛ d ɪ k ə l
medicine m ˈɛ d ə s ə n
meet m ˈi t
meeting m ˈi t ɪ ŋ
member m ˈɛ m b ɚ
memory m ˈɛ m ɚ i
mention m ˈɛ n ʃ ə n
message m ˈɛ s ə d͡ʒ
metal m ˈɛ t ə l
method m ˈɛ θ ə d
middle m ˈɪ d ə l
midnight m ˈɪ d n aɪ t
military m ˈɪ l ə t ˌɛ ɹ i
milk m ˈɪ l k
mind m ˈaɪ n d
mine m ˈaɪ n
minister m ˈɪ n ə s t ɚ
minor m ˈaɪ n ɚ
mirror m ˈɪ ɹ ɚ
missing m ˈɪ s ɪ ŋ
mission m ˈɪ ʃ ə n
mistake m ɪ s t ˈeɪ k
mix m ˈɪ k s
model m ˈɑ d ə l
modern m ˈɑ d ɚ n
moment m ˈoʊ m ə n t
monday m ˈʌ n d eɪ
mostly m ˈoʊ s t l i
mouth m ˈaʊ θ
movement m ˈu v m ə n t
movie m ˈu v i
mr m ˈɪ s t ɚ
mrs m ˈɪ s ə z
myself m aɪ s ˈɛ l f
narrow n ˈɛ ɹ oʊ
nation n ˈeɪ ʃ ə n
national n ˈæ ʃ ə n ə l
natural n ˈæ t͡ʃ ɚ ə l
nature n ˈeɪ t͡ʃ ɚ
nearly n ˈɪ ɹ l i
necessary n ˈɛ s ə s ˌɛ ɹ i
neck n ˈɛ k
neighbor n ˈeɪ b ɚ
neither n ˈi ð ɚ
nervous n ˈɚ v ə s
network n ˈɛ t w ɚ k
news n ˈu z
newspaper n ˈu z p eɪ p ɚ
nice n ˈaɪ s
nobody n ˈoʊ b ˌɑ d i
noise n ˈɔɪ z
none n ˈʌ n
noon n ˈu n
normal n ˈɔ ɹ m ə l
nose n ˈoʊ z
note n ˈoʊ t
notice n ˈoʊ t ə s
number n ˈʌ m b ɚ
nurse n ˈɚ s
object ˈɑ b d͡ʒ ɛ k t
occur ə k ˈɚ
ocean ˈoʊ ʃ ə n
october ɑ k t ˈoʊ b ɚ
offer ˈɔ f ɚ
office ˈɔ f ə s
officer ˈɔ f ə s ɚ
official ə f ˈɪ ʃ ə l
oil ˈɔɪ l
okay oʊ k ˈeɪ
operation ˌɑ p ɚ ˈeɪ ʃ ə n
opinion ə p ˈɪ n j ə n
opportunity ˌɑ p ɚ t ˈu n ə t i
option ˈɑ p ʃ ə n
orange ˈɔ ɹ ə n d͡ʒ
organization ˌɔ ɹ ɡ ə n ə z ˈeɪ ʃ ə n
original ɚ ˈɪ d͡ʒ ə n ə l
others ˈʌ ð ɚ z
otherwise ˈʌ ð ɚ w ˌaɪ z
ourselves aʊ ɚ s ˈɛ l v z
outside aʊ t s ˈaɪ d
owner ˈoʊ n ɚ
pain p ˈeɪ n
paint p ˈeɪ n t
pair p ˈɛ ɹ
pants p ˈæ n t s
parent p ˈɛ ɹ ə n t
park p ˈɑ ɹ k
particular p ɚ t ˈɪ k j ə l ɚ
partner p ˈɑ ɹ t n ɚ
party p ˈɑ ɹ t i
pass p ˈæ s
passenger p ˈæ s ə n d͡ʒ ɚ
past p ˈæ s t
path p ˈæ θ
patient p ˈeɪ ʃ ə n t
pattern p ˈæ t ɚ n
pay p ˈeɪ
peace p ˈi s
pen p ˈɛ n
pencil p ˈɛ n s ə l
perfect p ˈɚ f ɪ k t
perform p ɚ f ˈɔ ɹ m
period p ˈɪ ɹ i ə d
personal p ˈɚ s ə n ə l
phone f ˈoʊ n
photo f ˈoʊ t oʊ
phrase f ɹ ˈeɪ z
physical f ˈɪ z ɪ k ə l
piano p i ˈæ n oʊ
pick p ˈɪ k
pink p ˈɪ ŋ k
plan p l ˈæ n
plane p l ˈeɪ n
planet p l ˈæ n ə t
plastic p l ˈæ s t ɪ k
plate p l ˈeɪ t
player p l ˈeɪ ɚ
please p l ˈi z
pleasure p l ˈɛ ʒ ɚ
pocket p ˈɑ k ə t
poem p ˈoʊ ə m
police p ə l ˈi s
policy p ˈɑ l ə s i
political p ə l ˈɪ t ɪ k ə l
politics p ˈɑ l ə t ɪ k s
pool p ˈu l
poor p ˈʊ ɹ
popular p ˈɑ p j ə l ɚ
population p ˌɑ p j ə l ˈeɪ ʃ ə n
position p ə z ˈɪ ʃ ə n
positive p ˈɑ z ə t ɪ v
possible p ˈɑ s ə b ə l
pound p ˈaʊ n d
power p ˈaʊ ɚ
powerful p ˈaʊ ɚ f ə l
practice p ɹ ˈæ k t ə s
prepare p ɹ ɪ p ˈɛ ɹ
present p ɹ ˈɛ z ə n t
president p ɹ ˈɛ z ə d ə n t
press p ɹ ˈɛ s
pressure p ɹ ˈɛ ʃ ɚ
pretty p ɹ ˈɪ t i
prevent p ɹ ɪ v ˈɛ n t
price p ɹ ˈaɪ s
pride p ɹ ˈaɪ d
private p ɹ ˈaɪ v ə t
prize p ɹ ˈaɪ z
probably p ɹ ˈɑ b ə b l i
problem p ɹ ˈɑ b l ə m
process p ɹ ˈɑ s ɛ s
produce p ɹ ə d ˈu s
product p ɹ ˈɑ d ə k t
professor p ɹ ə f ˈɛ s ɚ
program p ɹ ˈoʊ ɡ ɹ æ m
project p ɹ ˈɑ d͡ʒ ɛ k t
promise p ɹ ˈɑ m ə s
protect p ɹ ə t ˈɛ k t
proud p ɹ ˈaʊ d
prove p ɹ ˈu v
provide p ɹ ə v ˈaɪ d
public p ˈʌ b l ɪ k
pull p ˈʊ l
purpose p ˈɚ p ə s
push p ˈʊ ʃ
quality k w ˈɑ l ə t i
quarter k w ˈɔ ɹ t ɚ
quiet k w ˈaɪ ə t
race ɹ ˈeɪ s
radio ɹ ˈeɪ d i ˌoʊ
raise ɹ ˈeɪ z
range ɹ ˈeɪ n d͡ʒ
rate ɹ ˈeɪ t
rather ɹ ˈæ ð ɚ
reach ɹ ˈi t͡ʃ
reaction ɹ i ˈæ k ʃ ə n
reason ɹ ˈi z ə n
receive ɹ ə s ˈi v
recent ɹ ˈi s ə n t
recently ɹ ˈi s ə n t l i
recognize ɹ ˈɛ k ə ɡ n ˌaɪ z
record ɹ ˈɛ k ɚ d
reduce ɹ ɪ d ˈu s
reflect ɹ ɪ f l ˈɛ k t
region ɹ ˈi d͡ʒ ə n
relationship ɹ ɪ l ˈeɪ ʃ ə n ʃ ˌɪ p
release ɹ ɪ l ˈi s
religion ɹ ɪ l ˈɪ d͡ʒ ə n
remain ɹ ɪ m ˈeɪ n
remove ɹ ɪ m ˈu v
repeat ɹ ɪ p ˈi t
replace ɹ ɪ p l ˈeɪ s
report ɹ ɪ p ˈɔ ɹ t
represent ɹ ˌɛ p ɹ ɪ z ˈɛ n t
require ɹ ɪ k w ˈaɪ ɚ
research ɹ ˈi s ɚ t͡ʃ
resource ɹ ˈi s ɔ ɹ s
respect ɹ ɪ s p ˈɛ k t
respond ɹ ɪ s p ˈɑ n d
response ɹ ɪ s p ˈɑ n s
responsibility ɹ ɪ s p ˌɑ n s ə b ˈɪ l ə t i
result ɹ ɪ z ˈʌ l t
return ɹ ɪ t ˈɚ n
reveal ɹ ɪ v ˈi l
review ɹ i v j ˈu
rich ɹ ˈɪ t͡ʃ
ride ɹ ˈaɪ d
ring ɹ ˈɪ ŋ
rise ɹ ˈaɪ z
risk ɹ ˈɪ s k
rule ɹ ˈu l
rush ɹ ˈʌ ʃ
sad s ˈæ d
safe s ˈeɪ f
safety s ˈeɪ f t i
salt s ˈɔ l t
sand s ˈæ n d
saturday s ˈæ t ɚ d eɪ
save s ˈeɪ v
scale s k ˈeɪ l
scene s ˈi n
science s ˈaɪ ə n s
scientist s ˈaɪ ə n t ə s t
score s k ˈɔ ɹ
screen s k ɹ ˈi n
search s ˈɚ t͡ʃ
season s ˈi z ə n
seat s ˈi t
secret s ˈi k ɹ ə t
section s ˈɛ k ʃ ə n
security s ɪ k j ˈʊ ɹ ə t i
sell s ˈɛ l
send s ˈɛ n d
senior s ˈi n j ɚ
sense s ˈɛ n s
separate s ˈɛ p ɚ ə t
september s ɛ p t ˈɛ m b ɚ
series s ˈɪ ɹ i z
serious s ˈɪ ɹ i ə s
serve s ˈɚ v
service s ˈɚ v ə s
settle s ˈɛ t ə l
several s ˈɛ v ɹ ə l
shake ʃ ˈeɪ k
shape ʃ ˈeɪ p
share ʃ ˈɛ ɹ
sharp ʃ ˈɑ ɹ p
shoe ʃ ˈu
shoot ʃ ˈu t
shop ʃ ˈɑ p
shoulder ʃ ˈoʊ l d ɚ
shout ʃ ˈaʊ t
sick s ˈɪ k
sign s ˈaɪ n
signal s ˈɪ ɡ n ə l
silence s ˈaɪ l ə n s
silver s ˈɪ l v ɚ
similar s ˈɪ m ə l ɚ
simple s ˈɪ m p ə l
single s ˈɪ ŋ ɡ ə l
sister s ˈɪ s t ɚ
sit s ˈɪ t
situation s ˌɪ t͡ʃ u ˈeɪ ʃ ə n
size s ˈaɪ z
skill s k ˈɪ l
skin s k ˈɪ n
sky s k ˈaɪ
smart s m ˈɑ ɹ t
smile s m ˈaɪ l
smoke s m ˈoʊ k
snow s n ˈoʊ
social s ˈoʊ ʃ ə l
society s ə s ˈaɪ ə t i
soft s ˈɔ f t
software s ˈɔ f t w ɛ ɹ
soil s ˈɔɪ l
soldier s ˈoʊ l d͡ʒ ɚ
solution s ə l ˈu ʃ ə n
solve s ˈɑ l v
somebody s ˈʌ m b ˌɑ d i
someone s ˈʌ m w ˌʌ n
somewhere s ˈʌ m w ˌɛ ɹ
son s ˈʌ n
sort s ˈɔ ɹ t
source s ˈɔ ɹ s
space s p ˈeɪ s
spanish s p ˈæ n ɪ ʃ
special s p ˈɛ ʃ ə l
specific s p ə s ˈɪ f ɪ k
spend s p ˈɛ n d
spirit s p ˈɪ ɹ ə t
sport s p ˈɔ ɹ t
spot s p ˈɑ t
spread s p ɹ ˈɛ d
spring s p ɹ ˈɪ ŋ
staff s t ˈæ f
stage s t ˈeɪ d͡ʒ
stair s t ˈɛ ɹ
standard s t ˈæ n d ɚ d
station s t ˈeɪ ʃ ə n
status s t ˈæ t ə s
step s t ˈɛ p
stick s t ˈɪ k
stock s t ˈɑ k
stone s t ˈoʊ n
store s t ˈɔ ɹ
storm s t ˈɔ ɹ m
straight s t ɹ ˈeɪ t
strange s t ɹ ˈeɪ n d͡ʒ
stream s t ɹ ˈi m
strength s t ɹ ˈɛ ŋ k θ
stress s t ɹ ˈɛ s
stretch s t ɹ ˈɛ t͡ʃ
strike s t ɹ ˈaɪ k
structure s t ɹ ˈʌ k t͡ʃ ɚ
student s t ˈu d ə n t
style s t ˈaɪ l
subject s ˈʌ b d͡ʒ ɪ k t
success s ə k s ˈɛ s
successful s ə k s ˈɛ s f ə l
sudden s ˈʌ d ə n
suddenly s ˈʌ d ə n l i
suffer s ˈʌ f ɚ
sugar ʃ ˈʊ ɡ ɚ
suggest s ə ɡ d͡ʒ ˈɛ s t
summer s ˈʌ m ɚ
sunday s ˈʌ n d eɪ
supply s ə p l ˈaɪ
support s ə p ˈɔ ɹ t
suppose s ə p ˈoʊ z
surface s ˈɚ f ə s
surprise s ɚ p ˈɹ aɪ z
survive s ɚ v ˈaɪ v
sweet s w ˈi t
swim s w ˈɪ m
switch s w ˈɪ t͡ʃ
table t ˈeɪ b ə l
tail t ˈeɪ l
target t ˈɑ ɹ ɡ ə t
task t ˈæ s k
taste t ˈeɪ s t
tax t ˈæ k s
tea t ˈi
teach t ˈi t͡ʃ
teacher t ˈi t͡ʃ ɚ
team t ˈi m
technology t ɛ k n ˈɑ l ə d͡ʒ i
television t ˈɛ l ə v ˌɪ ʒ ə n
temperature t ˈɛ m p ɹ ə t͡ʃ ɚ
term t ˈɚ m
themselves ð ɛ m s ˈɛ l v z
theory θ ˈɪ ɹ i
therefore ð ˈɛ ɹ f ɔ ɹ
thick θ ˈɪ k
thin θ ˈɪ n
third θ ˈɚ d
thought θ ˈɔ t
threat θ ɹ ˈɛ t
throat θ ɹ ˈoʊ t
throughout θ ɹ u ˈaʊ t
throw θ ɹ ˈoʊ
thursday θ ˈɚ z d eɪ
ticket t ˈɪ k ə t
tie t ˈaɪ
tiny t ˈaɪ n i
tired t ˈaɪ ɚ d
title t ˈaɪ t ə l
tomorrow t ə m ˈɑ ɹ oʊ
tone t ˈoʊ n
tongue t ˈʌ ŋ
tonight t ə n ˈaɪ t
tool t ˈu l
tooth t ˈu θ
total t ˈoʊ t ə l
touch t ˈʌ t͡ʃ
tough t ˈʌ f
tour t ˈʊ ɹ
track t ɹ ˈæ k
trade t ɹ ˈeɪ d
tradition t ɹ ə d ˈɪ ʃ ə n
traffic t ɹ ˈæ f ɪ k
train t ɹ ˈeɪ n
training t ɹ ˈeɪ n ɪ ŋ
travel t ɹ ˈæ v ə l
treat t ɹ ˈi t
treatment t ɹ ˈi t m ə n t
trial t ɹ ˈaɪ ə l
trip t ɹ ˈɪ p
trouble t ɹ ˈʌ b ə l
truck t ɹ ˈʌ k
true t ɹ ˈu
trust t ɹ ˈʌ s t
truth t ɹ ˈu θ
tuesday t ˈu z d eɪ
type t ˈaɪ p
uncle ˈʌ ŋ k ə l
understand ˌʌ n d ɚ s t ˈæ n d
unit j ˈu n ə t
united j u n ˈaɪ t ə d
university j ˌu n ə v ˈɚ s ə t i
unless ə n l ˈɛ s
usual j ˈu ʒ u ə l
usually j ˈu ʒ u ə l i
value v ˈæ l j u
variety v ɚ ˈaɪ ə t i
various v ˈɛ ɹ i ə s
vehicle v ˈi ɪ k ə l
version v ˈɚ ʒ ə n
victory v ˈɪ k t ɚ i
video v ˈɪ d i ˌoʊ
view v j ˈu
village v ˈɪ l ɪ d͡ʒ
violence v ˈaɪ ə l ə n s
visit v ˈɪ z ə t
voter v ˈoʊ t ɚ
wall w ˈɔ l
war w ˈɔ ɹ
warn w ˈɔ ɹ n
wash w ˈɑ ʃ
waste w ˈeɪ s t
wave w ˈeɪ v
weapon w ˈɛ p ə n
wear w ˈɛ ɹ
wednesday w ˈɛ n z d eɪ
weight w ˈeɪ t
welcome w ˈɛ l k ə m
west w ˈɛ s t
western w ˈɛ s t ɚ n
wet w ˈɛ t
whatever w ʌ t ˈɛ v ɚ
wheel w ˈi l
whether w ˈɛ ð ɚ
whose h ˈu z
wide w ˈaɪ d
wife w ˈaɪ f
wild w ˈaɪ l d
win w ˈɪ n
window w ˈɪ n d oʊ
wine w ˈaɪ n
wing w ˈɪ ŋ
winter w ˈɪ n t ɚ
wish w ˈɪ ʃ
within w ɪ ð ˈɪ n
wonder w ˈʌ n d ɚ
wonderful w ˈʌ n d ɚ f ə l
wood w ˈʊ d
worker w ˈɚ k ɚ
worry w ˈɚ i
worth w ˈɚ θ
wrong ɹ ˈɔ ŋ
yard j ˈɑ ɹ d
yeah j ˈɛ ə
yellow j ˈɛ l oʊ
yesterday j ˈɛ s t ɚ d ˌeɪ
yourself j ɔ ɹ s ˈɛ l f
youth j ˈu θ
zone z ˈoʊ n
accepted æ k s ˈɛ p t ə d
added ˈæ d ə d
ability ə b ˈɪ l ə t i
absolutely ˌæ b s ə l ˈu t l i
according ə k ˈɔ ɹ d ɪ ŋ
achieve ə t͡ʃ ˈi v
activity æ k t ˈɪ v ə t i
adventure æ d v ˈɛ n t͡ʃ ɚ
africa ˈæ f ɹ ɪ k ə
agreed ə ɡ ˈɹ i d
alive ə l ˈaɪ v
answered ˈæ n s ɚ d
appeared ə p ˈɪ ɹ d
army ˈɑ ɹ m i
arrived ɚ ˈaɪ v d
asked ˈæ s k t
asleep ə s l ˈi p
ate ˈeɪ t
aunt ˈæ n t
autumn ˈɔ t ə m
bathroom b ˈæ θ ɹ u m
bedroom b ˈɛ d ɹ u m
behave b ɪ h ˈeɪ v
believed b ɪ l ˈi v d
birthday b ˈɚ θ d eɪ
bitter b ˈɪ t ɚ
blame b l ˈeɪ m
blind b l ˈaɪ n d
blow b l ˈoʊ
boil b ˈɔɪ l
bought b ˈɔ t
brave b ɹ ˈeɪ v
broke b ɹ ˈoʊ k
broken b ɹ ˈoʊ k ə n
built b ˈɪ l t
cage k ˈeɪ d͡ʒ
called k ˈɔ l d
calm k ˈɑ m
carried k ˈɛ ɹ i d
caught k ˈɔ t
chapter t͡ʃ ˈæ p t ɚ
cheese t͡ʃ ˈi z
chest t͡ʃ ˈɛ s t
childhood t͡ʃ ˈaɪ l d h ʊ d
chocolate t͡ʃ ˈɔ k l ə t
chosen t͡ʃ ˈoʊ z ə n
cleaning k l ˈi n ɪ ŋ
clever k l ˈɛ v ɚ
climbed k l ˈaɪ m d
closer k l ˈoʊ s ɚ
coat k ˈoʊ t
comfortable k ˈʌ m f t ɚ b ə l
coming k ˈʌ m ɪ ŋ
completely k ə m p l ˈi t l i
confused k ə n f j ˈu z d
considered k ə n s ˈɪ d ɚ d
cousin k ˈʌ z ə n
covered k ˈʌ v ɚ d
crazy k ɹ ˈeɪ z i
cried k ɹ ˈaɪ d
curious k j ˈʊ ɹ i ə s
cute k j ˈu t
dangerous d ˈeɪ n d͡ʒ ɚ ə s
decided d ə s ˈaɪ d ə d
definitely d ˈɛ f ə n ə t l i
desert d ˈɛ z ɚ t
dessert d ɪ z ˈɚ t
died d ˈaɪ d
dirty d ˈɚ t i
doing d ˈu ɪ ŋ
drank d ɹ ˈæ ŋ k
drawn d ɹ ˈɔ n
dropped d ɹ ˈɑ p t
drove d ɹ ˈoʊ v
eaten ˈi t ə n
engineer ˌɛ n d͡ʒ ə n ˈɪ ɹ
enjoyed ɛ n d͡ʒ ˈɔɪ d
entered ˈɛ n t ɚ d
evil ˈi v ə l
excited ɪ k s ˈaɪ t ə d
exciting ɪ k s ˈaɪ t ɪ ŋ
expected ɪ k s p ˈɛ k t ə d
explained ɪ k s p l ˈeɪ n d
extremely ɪ k s t ɹ ˈi m l i
fallen f ˈɔ l ə n
fault f ˈɔ l t
favorite f ˈeɪ v ɚ ə t
fed f ˈɛ d
fellow f ˈɛ l oʊ
felt f ˈɛ l t
finished f ˈɪ n ɪ ʃ t
flew f l ˈu
followed f ˈɑ l oʊ d
foolish f ˈu l ɪ ʃ
forgot f ɚ ɡ ˈɑ t
forgotten f ɚ ɡ ˈɑ t ə n
fourth f ˈɔ ɹ θ
friendly f ɹ ˈɛ n d l i
frightened f ɹ ˈaɪ t ə n d
funny f ˈʌ n i
gate ɡ ˈeɪ t
gathered ɡ ˈæ ð ɚ d
gentleman d͡ʒ ˈɛ n t ə l m ə n
getting ɡ ˈɛ t ɪ ŋ
given ɡ ˈɪ v ə n
giving ɡ ˈɪ v ɪ ŋ
goes ɡ ˈoʊ z
golden ɡ ˈoʊ l d ə n
grandfather ɡ ɹ ˈæ n d f ˌɑ ð ɚ
grandmother ɡ ɹ ˈæ n d m ˌʌ ð ɚ
grateful ɡ ɹ ˈeɪ t f ə l
grown ɡ ɹ ˈoʊ n
happiness h ˈæ p i n ə s
having h ˈæ v ɪ ŋ
held h ˈɛ l d
helped h ˈɛ l p t
hers h ˈɚ z
hidden h ˈɪ d ə n
holding h ˈoʊ l d ɪ ŋ
honey h ˈʌ n i
hoping h ˈoʊ p ɪ ŋ
horrible h ˈɔ ɹ ə b ə l
hungry h ˈʌ ŋ ɡ ɹ i
hurried h ˈɚ i d
ill ˈɪ l
immediately ɪ m ˈi d i ə t l i
impossible ɪ m p ˈɑ s ə b ə l
jacket d͡ʒ ˈæ k ə t
joined d͡ʒ ˈɔɪ n d
kept k ˈɛ p t
killed k ˈɪ l d
kindness k ˈaɪ n d n ə s
kissed k ˈɪ s t
knowing n ˈoʊ ɪ ŋ
laughed l ˈæ f t
laughter l ˈæ f t ɚ
learned l ˈɚ n d
leaving l ˈi v ɪ ŋ
lied l ˈaɪ d
listened l ˈɪ s ə n d
living l ˈɪ v ɪ ŋ
looked l ˈʊ k t
looking l ˈʊ k ɪ ŋ
loved l ˈʌ v d
lovely l ˈʌ v l i
loving l ˈʌ v ɪ ŋ
lying l ˈaɪ ɪ ŋ
mad m ˈæ d
making m ˈeɪ k ɪ ŋ
married m ˈɛ ɹ i d
meant m ˈɛ n t
met m ˈɛ t
missed m ˈɪ s t
monkey m ˈʌ ŋ k i
moved m ˈu v d
moving m ˈu v ɪ ŋ
needed n ˈi d ə d
noticed n ˈoʊ t ə s t
nowhere n ˈoʊ w ɛ ɹ
offered ˈɔ f ɚ d
older ˈoʊ l d ɚ
opened ˈoʊ p ə n d
ordinary ˈɔ ɹ d ə n ˌɛ ɹ i
ours ˈaʊ ɚ z
owned ˈoʊ n d
passed p ˈæ s t
perfectly p ˈɚ f ɪ k t l i
picked p ˈɪ k t
played p l ˈeɪ d
playing p l ˈeɪ ɪ ŋ
pleased p l ˈi z d
pointed p ˈɔɪ n t ə d
prepared p ɹ ɪ p ˈɛ ɹ d
pulled p ˈʊ l d
pushed p ˈʊ ʃ t
putting p ˈʊ t ɪ ŋ
quietly k w ˈaɪ ə t l i
rabbit ɹ ˈæ b ə t
raised ɹ ˈeɪ z d
reached ɹ ˈi t͡ʃ t
reading ɹ ˈi d ɪ ŋ
realize ɹ ˈi ə l ˌaɪ z
realized ɹ ˈi ə l ˌaɪ z d
received ɹ ə s ˈi v d
remembered ɹ ɪ m ˈɛ m b ɚ d
replied ɹ ɪ p l ˈaɪ d
returned ɹ ɪ t ˈɚ n d
running ɹ ˈʌ n ɪ ŋ
sat s ˈæ t
saying s ˈeɪ ɪ ŋ
seemed s ˈi m d
seriously s ˈɪ ɹ i ə s l i
shouted ʃ ˈaʊ t ə d
showed ʃ ˈoʊ d
shut ʃ ˈʌ t
sight s ˈaɪ t
simply s ˈɪ m p l i
singing s ˈɪ ŋ ɪ ŋ
sitting s ˈɪ t ɪ ŋ
sleeping s l ˈi p ɪ ŋ
slept s l ˈɛ p t
slowly s l ˈoʊ l i
smiled s m ˈaɪ l d
sold s ˈoʊ l d
sometimes s ˈʌ m t aɪ m z
somewhat s ˈʌ m w ʌ t
sounded s ˈaʊ n d ə d
speaking s p ˈi k ɪ ŋ
spent s p ˈɛ n t
spoke s p ˈoʊ k
spoken s p ˈoʊ k ə n
standing s t ˈæ n d ɪ ŋ
stared s t ˈɛ ɹ d
started s t ˈɑ ɹ t ə d
stayed s t ˈeɪ d
stood s t ˈʊ d
stopped s t ˈɑ p t
stranger s t ɹ ˈeɪ n d͡ʒ ɚ
stupid s t ˈu p ə d
surprised s ɚ p ɹ ˈaɪ z d
taken t ˈeɪ k ə n
taking t ˈeɪ k ɪ ŋ
talked t ˈɔ k t
talking t ˈɔ k ɪ ŋ
taught t ˈɔ t
telling t ˈɛ l ɪ ŋ
terrible t ˈɛ ɹ ə b ə l
thinking θ ˈɪ ŋ k ɪ ŋ
thirsty θ ˈɚ s t i
threw θ ɹ ˈu
thrown θ ɹ ˈoʊ n
trying t ɹ ˈaɪ ɪ ŋ
turned t ˈɚ n d
turning t ˈɚ n ɪ ŋ
twice t w ˈaɪ s
ugly ˈʌ ɡ l i
understood ˌʌ n d ɚ s t ˈʊ d
upstairs ˌʌ p s t ˈɛ ɹ z
waited w ˈeɪ t ə d
waiting w ˈeɪ t ɪ ŋ
walked w ˈɔ k t
walking w ˈɔ k ɪ ŋ
watched w ˈɑ t͡ʃ t
watching w ˈɑ t͡ʃ ɪ ŋ
wearing w ˈɛ ɹ ɪ ŋ
whisper w ˈɪ s p ɚ
whispered w ˈɪ s p ɚ d
wished w ˈɪ ʃ t
woke w ˈoʊ k
woken w ˈoʊ k ə n
won w ˈʌ n
wooden w ˈʊ d ə n
wore w ˈɔ ɹ
working w ˈɚ k ɪ ŋ
worried w ˈɚ i d
worse w ˈɚ s
worst w ˈɚ s t
written ɹ ˈɪ t ə n
wrote ɹ ˈoʊ t
younger j ˈʌ ŋ ɡ ɚ
yours j ˈɔ ɹ z
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


# Suffixes with predictable primary-stress position, counted in syllables
# from the END of the word (1 = last syllable, 2 = penult, 3 = antepenult).
# Standard English stress phonology; gruut resolved these via its lexicon.
_SUFFIX_STRESS: typing.Tuple[typing.Tuple[str, int], ...] = (
    # stress falls ON the suffix
    ("ee", 1), ("eer", 1), ("ese", 1), ("esque", 1), ("ette", 1),
    ("ique", 1), ("oon", 1), ("ain", 1),
    # stress on the syllable immediately before the suffix
    ("tion", 2), ("sion", 2), ("cian", 2), ("tious", 2), ("cious", 2),
    ("ic", 2), ("ical", 3), ("ically", 4), ("ity", 3), ("ety", 3),
    ("ify", 3), ("itive", 3), ("itude", 3), ("graphy", 3), ("logy", 3),
    ("gamy", 3), ("cracy", 3), ("meter", 3), ("pathy", 3),
)


def _vowel_indices(phonemes: typing.Sequence[str]) -> typing.List[int]:
    return [
        i
        for i, p in enumerate(phonemes)
        if p.lstrip("ˈˌ") in _VOWEL_SYMBOLS
    ]


def _ensure_stress(
    phonemes: typing.List[str], word: str = ""
) -> typing.List[str]:
    """Assign primary stress to rule-derived pronunciations.

    Suffix phonology picks the syllable when it can; otherwise the first
    vowel carries stress (the common English noun/adjective pattern).
    Words of 4+ syllables with late primary stress also get an initial
    secondary stress.
    """
    out = list(phonemes)
    vowels = _vowel_indices(out)
    if not vowels:
        return out

    suffix_target = None
    for suffix, from_end in _SUFFIX_STRESS:
        if (
            word.endswith(suffix)
            and len(word) > len(suffix) + 2
            and from_end <= len(vowels)
        ):
            suffix_target = len(vowels) - from_end
            break

    has_stress = any(p.startswith(("ˈ", "ˌ")) for p in out)
    if suffix_target is None:
        if has_stress:
            return out
        target = 0
    else:
        # the rule table pre-stresses some long vowels; suffix phonology
        # overrides it
        out = [
            p.lstrip("ˈˌ") if p.lstrip("ˈˌ") in _VOWEL_SYMBOLS else p
            for p in out
        ]
        vowels = _vowel_indices(out)
        target = suffix_target
    out[vowels[target]] = "ˈ" + out[vowels[target]]
    if target >= 2 and len(vowels) >= 4:
        out[vowels[0]] = "ˌ" + out[vowels[0]]
    return out


# Common noun/verb homographs: (noun-or-adjective, verb) pronunciations.
# gruut disambiguated with a POS model; here a light context heuristic
# (see phonemize) picks the reading.
_HOMOGRAPHS: typing.Dict[str, typing.Tuple[typing.List[str], typing.List[str]]] = {
    "record": (["ˈɹ", "ɛ", "k", "ɚ", "d"], ["ɹ", "ɪ", "k", "ˈɔ", "ɹ", "d"]),
    "present": (["p", "ˈɹ", "ɛ", "z", "ə", "n", "t"],
                ["p", "ɹ", "ɪ", "z", "ˈɛ", "n", "t"]),
    "object": (["ˈɑ", "b", "d͡ʒ", "ɛ", "k", "t"],
               ["ə", "b", "d͡ʒ", "ˈɛ", "k", "t"]),
    "subject": (["s", "ˈʌ", "b", "d͡ʒ", "ɪ", "k", "t"],
                ["s", "ə", "b", "d͡ʒ", "ˈɛ", "k", "t"]),
    "conduct": (["k", "ˈɑ", "n", "d", "ʌ", "k", "t"],
                ["k", "ə", "n", "d", "ˈʌ", "k", "t"]),
    "produce": (["p", "ˈɹ", "oʊ", "d", "u", "s"],
                ["p", "ɹ", "ə", "d", "ˈu", "s"]),
    "permit": (["p", "ˈɚ", "m", "ɪ", "t"], ["p", "ɚ", "m", "ˈɪ", "t"]),
    "contest": (["k", "ˈɑ", "n", "t", "ɛ", "s", "t"],
                ["k", "ə", "n", "t", "ˈɛ", "s", "t"]),
    "desert": (["d", "ˈɛ", "z", "ɚ", "t"], ["d", "ɪ", "z", "ˈɚ", "t"]),
    "refuse": (["ˈɹ", "ɛ", "f", "j", "u", "s"],
               ["ɹ", "ɪ", "f", "j", "ˈu", "z"]),
    "content": (["k", "ˈɑ", "n", "t", "ɛ", "n", "t"],
                ["k", "ə", "n", "t", "ˈɛ", "n", "t"]),
    "project": (["p", "ˈɹ", "ɑ", "d͡ʒ", "ɛ", "k", "t"],
                ["p", "ɹ", "ə", "d͡ʒ", "ˈɛ", "k", "t"]),
    "rebel": (["ˈɹ", "ɛ", "b", "ə", "l"], ["ɹ", "ɪ", "b", "ˈɛ", "l"]),
    "increase": (["ˈɪ", "n", "k", "ɹ", "i", "s"],
                 ["ɪ", "n", "k", "ˈɹ", "i", "s"]),
    "live": (["l", "ˈaɪ", "v"], ["l", "ˈɪ", "v"]),  # adj vs verb
    "wind": (["w", "ˈɪ", "n", "d"], ["w", "ˈaɪ", "n", "d"]),  # noun vs verb
    "bow": (["b", "ˈoʊ"], ["b", "ˈaʊ"]),  # ribbon vs bend
}

# Past-tense homographs: pronunciation flips after perfect-tense cues.
_PAST_HOMOGRAPHS: typing.Dict[str, typing.Tuple[typing.List[str], typing.List[str]]] = {
    "read": (["ˈɹ", "i", "d"], ["ˈɹ", "ɛ", "d"]),
    "lead": (["l", "ˈi", "d"], ["l", "ˈɛ", "d"]),  # verb; the metal is past-form
}

_VERB_CUES = {
    "to", "will", "would", "can", "could", "shall", "should", "may",
    "might", "must", "cannot", "don't", "doesn't", "didn't", "won't",
    "i", "we", "you", "they", "please", "not", "gonna", "let's",
}
_NOUN_CUES = {
    "the", "a", "an", "this", "that", "these", "those", "my", "your",
    "his", "her", "its", "our", "their", "no", "any", "some", "each",
    "every", "one", "new", "old", "public", "world",
}
_PAST_CUES = {"have", "has", "had", "was", "were", "been", "already", "he",
              "she", "i've", "we've", "they've", "he's", "she's"}


def phonemize(word: str, prev: str = "", nxt: str = "") -> typing.List[str]:
    w = word.lower().strip()
    if not w:
        return []

    # noun/verb homographs: a light context heuristic stands in for
    # gruut's POS tagger.  Nouns are the default reading.
    if w in _HOMOGRAPHS:
        noun, verb = _HOMOGRAPHS[w]
        prev_l = prev.lower()
        if prev_l in _NOUN_CUES:
            return list(noun)
        if prev_l in _VERB_CUES:
            return list(verb)
        return list(noun)
    if w in _PAST_HOMOGRAPHS:
        base, past = _PAST_HOMOGRAPHS[w]
        return list(past) if prev.lower() in _PAST_CUES else list(base)

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

    return _ensure_stress(_apply_rules(w), w)
phonemize.context_aware = True
