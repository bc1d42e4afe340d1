"""SSML parsing into a flat event stream.

Covers the SSML subset the reference exercises through gruut
(larynx/__init__.py:71-177 and the web/MaryTTS surfaces): ``<speak>``,
``<voice name>``, ``<p>``, ``<s>``, ``<break time>``, ``<mark name>``,
``<sub alias>``, ``<say-as interpret-as>``, ``<phoneme ph>``, ``<w>``, and
``xml:lang`` / ``lang`` attributes.
"""

import re
import typing
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field


@dataclass
class TextEvent:
    text: str
    voice: str = ""
    lang: str = ""
    spell_out: bool = False


@dataclass
class PhonemesEvent:
    """Explicit pronunciation from <phoneme ph="...">."""

    text: str
    phonemes: typing.List[str] = field(default_factory=list)
    voice: str = ""
    lang: str = ""


@dataclass
class BreakEvent:
    time_ms: int = 0


@dataclass
class MarkEvent:
    name: str = ""


@dataclass
class BoundaryEvent:
    """Forced sentence boundary (</s>, </p>, voice scope edge)."""


Event = typing.Union[TextEvent, PhonemesEvent, BreakEvent, MarkEvent, BoundaryEvent]

_TIME_RE = re.compile(r"^\s*(\d+(?:\.\d+)?)\s*(ms|s)?\s*$")


def parse_time_ms(value: typing.Optional[str]) -> int:
    if not value:
        return 0
    m = _TIME_RE.match(value)
    if not m:
        return 0
    amount = float(m.group(1))
    # SSML requires a unit; treat a bare number as milliseconds — reading
    # time="500" as 500 SECONDS would emit minutes of silence
    unit = m.group(2) or "ms"
    return int(amount * 1000) if unit == "s" else int(amount)


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def _attr(elem: ET.Element, *names: str) -> typing.Optional[str]:
    for key, value in elem.attrib.items():
        if _strip_ns(key) in names:
            return value
    return None


def parse_ssml(markup: str) -> typing.List[Event]:
    """Parse SSML (or a bare fragment) into an event stream."""
    markup = markup.strip()
    if not markup.startswith("<"):
        markup = f"<speak>{markup}</speak>"
    try:
        root = ET.fromstring(markup)
    except ET.ParseError:
        root = ET.fromstring(f"<speak>{markup}</speak>")

    events: typing.List[Event] = []
    _walk(root, "", "", False, events)
    return events


def _emit_text(
    events: typing.List[Event], text: typing.Optional[str], voice, lang, spell
):
    if text and text.strip():
        events.append(
            TextEvent(text=text, voice=voice, lang=lang, spell_out=spell)
        )


def _walk(
    elem: ET.Element,
    voice: str,
    lang: str,
    spell_out: bool,
    events: typing.List[Event],
) -> None:
    tag = _strip_ns(elem.tag)

    elem_lang = _attr(elem, "lang") or lang
    if tag == "speak":
        lang = elem_lang
    elif tag == "voice":
        voice = _attr(elem, "name") or voice
        lang = elem_lang
    elif tag in ("p", "s"):
        events.append(BoundaryEvent())
        lang = elem_lang
    elif tag == "break":
        events.append(BreakEvent(parse_time_ms(_attr(elem, "time"))))
        return
    elif tag == "mark":
        events.append(MarkEvent(_attr(elem, "name") or ""))
        return
    elif tag == "sub":
        alias = _attr(elem, "alias") or ""
        _emit_text(events, alias, voice, elem_lang, spell_out)
        return
    elif tag == "phoneme":
        ph = _attr(elem, "ph") or ""
        word_text = "".join(elem.itertext()).strip()
        events.append(
            PhonemesEvent(
                text=word_text or ph,
                phonemes=ph.split() if " " in ph else list(_split_ipa(ph)),
                voice=voice,
                lang=elem_lang,
            )
        )
        return
    elif tag == "say-as":
        interpret = (_attr(elem, "interpret-as") or "").lower()
        spell = interpret in ("characters", "spell-out", "digits", "telephone")
        _emit_text(events, "".join(elem.itertext()), voice, elem_lang, spell)
        return
    elif tag == "w":
        lang = elem_lang

    _emit_text(events, elem.text, voice, lang, spell_out)
    for child in elem:
        _walk(child, voice, lang, spell_out, events)
        _emit_text(events, child.tail, voice, lang, spell_out)

    if tag in ("p", "s"):
        events.append(BoundaryEvent())
    elif tag == "voice":
        events.append(BoundaryEvent())


_IPA_MODIFIERS = "ˈˌːʲ̯͡ ²'"


def _split_ipa(ph: str) -> typing.List[str]:
    """Split an unspaced IPA string into symbols (greedy, keeps ties)."""
    out: typing.List[str] = []
    i = 0
    while i < len(ph):
        ch = ph[i]
        if ch == " ":
            i += 1
            continue
        symbol = ch
        i += 1
        # attach combining marks / tie bars and the tied symbol
        while i < len(ph) and (ph[i] in "ː̯ʲ̃" or ph[i] == "͡"):
            if ph[i] == "͡" and i + 1 < len(ph):
                symbol += ph[i] + ph[i + 1]
                i += 2
            else:
                symbol += ph[i]
                i += 1
        if ch in "ˈˌ" and i < len(ph):
            # stress marker binds to the following symbol
            nxt = _split_ipa(ph[i:])
            if nxt:
                nxt[0] = symbol + nxt[0]
                return out + nxt
        out.append(symbol)
    return out
