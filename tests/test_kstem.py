"""Krovetz stemmer vectors (FIXTURES.md §6) — each pins a cascade rule from
ref:src/KrovetzStemmer.cpp:1046-1097 or a guard from :1004-1021."""

from __future__ import annotations

import pytest

from indri_5_5_ray.kstem import MAX_WORD_LENGTH, KrovetzStemmer

VECTORS = [
    # guards: too short / too long / non-alpha → lowercase only
    ("at", "at"),
    ("ab3cd", "ab3cd"),
    ("X" * 25, "x" * 25),
    ("Mixed3Case", "mixed3case"),
    # dictionary hit before any rule → unchanged
    ("table", "table"),
    ("interest", "interest"),
    # plural
    ("tables", "table"),
    ("calories", "calorie"),      # -ies with dictionary check
    ("flies", "flies"),           # headword — dictionary hit before rules
    ("aides", "aide"),            # -es: remove 's' only
    ("crosses", "cross"),         # double-s exception
    ("indexes", "index"),
    ("trees", "tree"),
    ("famous", "famous"),         # -ous protected
    # past tense
    ("aided", "aid"),
    ("microcoded", "microcode"),
    ("planned", "plan"),
    ("backfilled", "backfill"),
    ("died", "die"),
    ("fled", "flee"),             # short word direct conflation
    # aspect (-ing)
    ("running", "running"),       # headword
    ("longings", "longing"),      # plural then dictionary (not "long")
    ("thing", "thing"),           # short-word guard
    ("aging", "age"),             # direct conflation
    # -ity
    ("immunity", "immune"),
    ("capacity", "capacity"),
    ("probability", "probability"),  # headword
    # -ness
    ("happiness", "happiness"),   # headword
    # -ion
    ("definition", "definition"), # headword wins before rules
    ("amplification", "amplify"),
    ("resignation", "resignation"),  # headword
    # -er/-or
    ("bigger", "big"),
    ("organizer", "organize"),    # -izer → -ize
    # -ly
    ("quickly", "quick"),
    ("heuristically", "heuristic"),
    # -al
    ("optimal", "optimum"),
    # -ize
    ("digitize", "digitize"),     # headword
    # irregulars via conflation table
    ("italians", "italy"),
    ("bookshelves", "bookshelf"),
    ("wolves", "wolf"),
    ("theses", "thesis"),
    ("matrices", "matrice"),      # -es: default retains the e (no dict hit)
]


@pytest.mark.parametrize("word,expected", VECTORS, ids=[v[0] for v in VECTORS])
def test_kstem_vectors(word, expected):
    assert KrovetzStemmer().stem(word) == expected


def test_cache_consistency():
    ks = KrovetzStemmer()
    assert ks.stem("tables") == "table"
    assert ks.stem("tables") == "table"  # cached path
    assert ks.stem("TABLES") == "table"  # distinct cache key, same stem


def test_stem_can_expand():
    # the -ic → -ical expansion path exists (ref:src/KrovetzStemmer.cpp:838-846)
    ks = KrovetzStemmer()
    out = ks.stem("canonic")
    assert out in ("canonical", "canonic")  # depends on dictionary contents


def test_max_word_length_guard():
    ks = KrovetzStemmer()
    w = "a" * (MAX_WORD_LENGTH - 1)
    assert ks.stem(w) == w  # length 24: stemmed path but no rule applies... or guard


def test_testdata_vocab_stems_identity():
    """The driver testdata's closed 31-term vocabulary Krovetz-stems to
    itself — the invariant that lets bm25_topk_kstem / lm_topk_kstem share
    the unstemmed SQL oracles exactly.  If the generator's vocabulary ever
    changes, this catches it before the oracle silently diverges."""
    from indri_5_5_ray.kstem import KrovetzStemmer

    vocab = ['a', 'agg', 'batch', 'big', 'column', 'customer', 'data',
             'dup', 'fast', 'filter', 'group', 'hash', 'join', 'key',
             'line', 'merge', 'order', 'part', 'query', 'row', 'scan',
             'slow', 'small', 'sort', 'spark', 'stream', 'table', 'the',
             'value', 'vector', 'window']
    ks = KrovetzStemmer()
    assert {t: ks.stem(t) for t in vocab} == {t: t for t in vocab}

    import os
    import re

    import pyarrow.parquet as pq

    sf = "/root/testdata/sf0.01/documents.parquet"
    if os.path.exists(sf):
        texts = pq.read_table(sf, columns=["text"]).column("text").to_pylist()
        seen = set()
        for t in texts:
            seen.update(re.findall(r"[a-z0-9]+", t.lower()))
        assert seen <= set(vocab)
