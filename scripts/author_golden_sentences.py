#!/usr/bin/env python3
"""Candidate-generation helper for the sentence-level golden fixtures.

Reads one sentence per line from stdin (or a file), runs the full text
frontend (tokenize -> normalize -> G2P) for the given language and prints
fixture-format lines::

    <text>\t<word1 phonemes> {WORD_SEP} <word2 phonemes> ...

The output is a *candidate*: every line must be hand-reviewed against the
language's standard pronunciation before being committed to
``tests/golden/sentences/<lang>.tsv`` (errors found during review are
fixed in the G2P/normalizer first, then the candidate is regenerated).
Break tokens appear as their symbols (``|`` minor, ``‖`` major).
"""

import argparse
import sys

WORD_SEP = " · "


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("lang")
    ap.add_argument("infile", nargs="?", default="-")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from larynx_tpu.text.frontend import sentences as frontend_sentences

    fh = sys.stdin if args.infile == "-" else open(args.infile, encoding="utf-8")
    for line in fh:
        text = line.strip()
        if not text or text.startswith("#"):
            continue
        groups = []
        for sent in frontend_sentences(text, args.lang):
            for word in sent.words:
                if word.phonemes:
                    groups.append(" ".join(word.phonemes))
        print(f"{text}\t{WORD_SEP.join(groups)}")


if __name__ == "__main__":
    main()
