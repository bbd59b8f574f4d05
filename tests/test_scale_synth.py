"""Scale-synth cipher scheme (tools/scale_probe.py): the per-replica
substitution cipher must preserve within-replica gram structure
isomorphically and share no char-gram across replicas (VERDICT r13
item 5 — the word-suffix scheme it replaces left stem-internal
char-grams byte-identical across replicas)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.scale_probe import _SRC_ALPHABET, _cipher_alphabet  # noqa: E402


def _apply(text: str, k: int, ns: str = "") -> str:
    table = str.maketrans(_SRC_ALPHABET, _cipher_alphabet(k, ns))
    return text.translate(table)


def test_cipher_is_bijective_and_class_preserving():
    for k in (1, 2, 37, 999):
        alpha = _cipher_alphabet(k)
        assert len(alpha) == len(_SRC_ALPHABET)
        assert sorted(alpha) == sorted(_SRC_ALPHABET)  # bijection
        # letters stay letters, digits stay digits (word shapes survive)
        assert sorted(alpha[:26]) == sorted(_SRC_ALPHABET[:26])
        assert sorted(alpha[26:]) == sorted(_SRC_ALPHABET[26:])


def test_within_replica_gram_structure_is_isomorphic():
    """Equal grams stay equal, distinct grams stay distinct — for char
    n-grams AND word n-grams — under every replica's cipher."""
    text = "spark sort fast sort spark sort fast value 42"
    for k in (1, 5):
        enc = _apply(text, k)
        words, ewords = text.split(), enc.split()
        assert len(words) == len(ewords)
        for i in range(len(words)):
            for j in range(len(words)):
                assert (words[i] == words[j]) == (ewords[i] == ewords[j])
        for n in (3, 8):
            g = [text[i : i + n] for i in range(len(text) - n + 1)]
            eg = [enc[i : i + n] for i in range(len(enc) - n + 1)]
            for i in range(len(g)):
                for j in range(len(g)):
                    assert (g[i] == g[j]) == (eg[i] == eg[j])


def test_no_char_gram_shared_across_replicas():
    """The r12 suffix scheme's bug: char-8-grams inside long words were
    replica-shared. Under the cipher, no 8-gram containing an
    alphanumeric survives into another replica."""
    text = "aggregation partition fingerprint 1234567890"
    n = 8
    grams = lambda s: {  # noqa: E731
        s[i : i + n]
        for i in range(len(s) - n + 1)
        if any(c.isalnum() for c in s[i : i + n])
    }
    seen = grams(text)
    for k in (1, 2, 3, 50):
        gk = grams(_apply(text, k))
        assert not (gk & seen), f"replica {k} shares grams with base"
        seen |= gk
    # outer namespace is a distinct cipher family (nested 1000x build)
    outer = grams(_apply(text, 1, ns="outer|"))
    assert not (outer & grams(_apply(text, 1)))
