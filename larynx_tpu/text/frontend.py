"""Text frontend orchestration: ``sentences()`` — the gruut replacement.

Produces :class:`~larynx_tpu.text.types.Sentence` objects with per-word IPA
phonemes, SSML pauses and marks — the exact structure the pipeline consumes
(reference usage: larynx/__init__.py:71-177).
"""

import typing

from larynx_tpu.text import ssml as ssml_mod
from larynx_tpu.text.g2p import get_phonemizer
from larynx_tpu.text.langs import resolve_lang
from larynx_tpu.text.tokenize import split_sentences, words_of
from larynx_tpu.text.types import MAJOR_BREAK, MINOR_BREAK, Sentence, Word


def _phonemize_words(
    kinds_tokens: typing.Sequence[typing.Tuple[str, str]],
    lang: str,
    spell_out: bool = False,
) -> typing.List[Word]:
    phonemize = get_phonemizer(lang)
    context_aware = getattr(phonemize, "context_aware", False)
    word_tokens = [t for k, t in kinds_tokens if k == "word"]
    words: typing.List[Word] = []
    word_idx = 0
    for kind, token in kinds_tokens:
        if kind == "minor":
            words.append(Word(text=token, phonemes=[MINOR_BREAK], is_break=True))
        elif kind == "major":
            words.append(Word(text=token, phonemes=[MAJOR_BREAK], is_break=True))
        elif spell_out:
            for ch in token:
                phonemes = phonemize(ch)
                if phonemes:
                    words.append(Word(text=ch, phonemes=phonemes))
            word_idx += 1
        else:
            if context_aware:
                # neighboring words drive homograph disambiguation
                prev = word_tokens[word_idx - 1] if word_idx > 0 else ""
                nxt = (
                    word_tokens[word_idx + 1]
                    if word_idx + 1 < len(word_tokens)
                    else ""
                )
                phonemes = phonemize(token, prev=prev, nxt=nxt)
            else:
                phonemes = phonemize(token)
            if phonemes:
                words.append(Word(text=token, phonemes=phonemes))
            word_idx += 1
    return words


def _plain_sentences(text: str, lang: str) -> typing.Iterator[Sentence]:
    for raw in split_sentences(text, lang):
        words = _phonemize_words(words_of(raw, lang), lang)
        if not words:
            continue
        # NO trailing break is synthesized: a sentence ends with ‖ only when
        # the text carries final punctuation (the ru-ru golden fixtures have
        # unpunctuated sentences with no trailing ‖)
        yield Sentence(
            text=raw, text_with_ws=raw + " ", lang=lang, words=words
        )


def sentences(
    text: str,
    lang: str = "en-us",
    ssml: bool = False,
    explicit_lang: bool = False,
    **_kwargs,
) -> typing.Iterator[Sentence]:
    """Segment + normalize + phonemize text (gruut.sentences equivalent).

    With ``ssml=True`` the input is parsed as SSML: per-sentence voice/lang
    switching, <break> pauses, and <mark> names are attached to sentences
    (reference consumption: larynx/__init__.py:74-177).
    """
    lang = resolve_lang(lang)
    if not ssml:
        yield from _plain_sentences(text, lang)
        return

    # SSML path is materialized up front: trailing <break>/<mark> events
    # mutate already-built sentences (pause_after/marks_after), so laziness
    # would leak half-attached metadata to the consumer.
    yield from _ssml_sentences(text, lang)


def _ssml_sentences(text: str, lang: str) -> typing.List[Sentence]:
    events = ssml_mod.parse_ssml(text)

    # Group events into segments at boundaries/voice changes, accumulating
    # pending pauses/marks that attach to the next (or previous) sentence.
    pending_pause_ms = 0
    pending_marks: typing.List[str] = []
    last_sentence: typing.Optional[Sentence] = None

    segment_text: typing.List[str] = []
    segment_phoneme_words: typing.Dict[int, typing.List[Word]] = {}
    segment_voice = ""
    segment_lang = lang
    segment_spell = False

    def flush() -> typing.Iterator[Sentence]:
        nonlocal segment_text, pending_pause_ms, pending_marks, last_sentence
        nonlocal segment_phoneme_words
        raw_all = " ".join(t for t in segment_text if t.strip())
        segment_text = []
        phoneme_words = segment_phoneme_words
        segment_phoneme_words = {}
        if not raw_all.strip() and not phoneme_words:
            return
        seg_lang = resolve_lang(segment_lang) if segment_lang else lang
        raws = split_sentences(raw_all, seg_lang) if raw_all.strip() else [""]
        for i, raw in enumerate(raws):
            words = _phonemize_words(words_of(raw, seg_lang), seg_lang, segment_spell)
            if i == len(raws) - 1:
                # explicit <phoneme> words append at segment end
                for w_list in phoneme_words.values():
                    words.extend(w_list)
            if not words:
                continue
            sent = Sentence(
                text=raw or " ".join(w.text for w in words),
                text_with_ws=(raw or "") + " ",
                lang=seg_lang,
                voice=segment_voice,
                words=words,
            )
            if pending_pause_ms > 0:
                sent.pause_before_ms = pending_pause_ms
                pending_pause_ms = 0
            if pending_marks:
                sent.marks_before = list(pending_marks)
                pending_marks = []
            last_sentence = sent
            yield sent

    out: typing.List[Sentence] = []
    idx = 0
    for event in events:
        if isinstance(event, ssml_mod.TextEvent):
            if (
                event.voice != segment_voice
                or (event.lang or lang) != segment_lang
                or event.spell_out != segment_spell
            ) and (segment_text or segment_phoneme_words):
                out.extend(flush())
            segment_voice = event.voice
            segment_lang = event.lang or lang
            segment_spell = event.spell_out
            segment_text.append(event.text)
        elif isinstance(event, ssml_mod.PhonemesEvent):
            segment_voice = event.voice or segment_voice
            segment_lang = event.lang or segment_lang
            segment_phoneme_words.setdefault(idx, []).append(
                Word(text=event.text, phonemes=list(event.phonemes))
            )
        elif isinstance(event, ssml_mod.BreakEvent):
            if segment_text or segment_phoneme_words:
                out.extend(flush())
            # A pause between sentences attaches to the following sentence
            # (pause_before); the reference sums sentence + word pauses
            # (larynx/__init__.py:135-143).
            pending_pause_ms += event.time_ms
        elif isinstance(event, ssml_mod.MarkEvent):
            if segment_text or segment_phoneme_words:
                out.extend(flush())
            if last_sentence is not None:
                last_sentence.marks_after.append(event.name)
            else:
                pending_marks.append(event.name)
        elif isinstance(event, ssml_mod.BoundaryEvent):
            if segment_text or segment_phoneme_words:
                out.extend(flush())
        idx += 1

    out.extend(flush())
    # trailing <break> with no following sentence: attach to the last one
    if pending_pause_ms > 0 and out:
        out[-1].pause_after_ms += pending_pause_ms
    return out
