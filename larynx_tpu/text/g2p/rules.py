"""Shared machinery for ordered-rule grapheme-to-phoneme engines."""

import typing

Rule = typing.Tuple[str, str]  # (grapheme pattern, space-separated phonemes)


def apply_rules(
    word: str,
    rules: typing.Sequence[Rule],
    context_rules: typing.Optional[
        typing.Callable[[str, int], typing.Optional[typing.Tuple[int, typing.List[str]]]]
    ] = None,
) -> typing.List[str]:
    """Greedy longest-match left-to-right rule application.

    ``context_rules(word, i)`` may claim a span first: return
    (consumed_length, phonemes) or None.
    """
    return apply_rules_span(word, 0, len(word), rules, context_rules)


def stress_nth_vowel_from_end(
    phonemes: typing.List[str],
    vowels: typing.Container[str],
    n: int = 2,
    marker: str = "ˈ",
) -> typing.List[str]:
    """Attach a stress marker to the n-th vowel symbol from the end
    (n=2 ~ penultimate syllable, n=1 ~ final); no-op if already stressed."""
    if any(p.startswith(("ˈ", "ˌ", "'")) for p in phonemes):
        return phonemes
    vowel_positions = [i for i, p in enumerate(phonemes) if p in vowels]
    if not vowel_positions:
        return phonemes
    idx = vowel_positions[-n] if len(vowel_positions) >= n else vowel_positions[0]
    out = list(phonemes)
    out[idx] = marker + out[idx]
    return out


def apply_rules_span(
    word: str,
    start: int,
    stop: int,
    rules: typing.Sequence[Rule],
    context_rules=None,
) -> typing.List[str]:
    """apply_rules over word[start:stop] with context drawn from the FULL
    word.  Accent handling splits words at the stressed vowel; the halves
    must not look like word edges (Spanish "policía" needs the c to see
    its i; Italian "già" needs gi+à to read as one unit).  A context rule
    may consume past ``stop`` (marker letters merging with the stressed
    vowel); plain rules are clipped to the span."""
    out: typing.List[str] = []
    i = start
    while i < stop:
        if context_rules is not None:
            claimed = context_rules(word, i)
            if claimed is not None:
                length, phones = claimed
                out.extend(phones)
                i += length
                continue
        for pattern, phones in rules:
            if word.startswith(pattern, i) and i + len(pattern) <= stop:
                if phones:
                    out.extend(phones.split())
                i += len(pattern)
                break
        else:
            i += 1
    return out
