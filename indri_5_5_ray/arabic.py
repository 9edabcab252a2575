"""Larkey Arabic light stemmer family (``arabic_*`` stemmer modes).

Re-implements the reference's six stemming functions
(ref:src/Arabic_Stemmer_utf8.cpp:664-671 ``stemtable_unicode``):

========================  =====================================================
``none``                  identity
``arabic_stop``           drop the word if it is on the Arabic stopword list
``arabic_norm2``          table normalization (:786-804): codepoints outside
                          U+0600..U+06FF pass through, codepoints in the
                          Arabic block are mapped via ``normChars`` (alef
                          variants → alef, teh marbuta → heh, alef maqsura →
                          yeh) or DROPPED if absent from the table (tatweel,
                          harakat/diacritics)
``arabic_norm2_stop``     norm2, then stop-check the normalized form (:806)
``arabic_light10``        norm2 → strip one leading waw if ≥4 chars remain
                          (:825) → strip the FIRST matching definite article
                          if the remainder keeps >len(article)+1 chars
                          (:722-735) → if >2 chars, strip each of the 10
                          suffixes once, in table order, while the remainder
                          keeps >len(suffix)+1 chars (:743-763)
``arabic_light10_stop``   norm2, stop-check, then the light10 tail (:839-868)
========================  =====================================================

A stopped / emptied word returns ``""``; the ingest chain's termID-0
semantics (``stages/ingest.py`` ``TermProcessor.process``) turn that into a
counted-but-unindexed slot, exactly like the reference where the empty
stemmed string flows to ``MemoryIndex``'s empty-word check
(ref:src/ArabicStemmerTransformation.cpp:84-108 keeps empty terms;
ref:src/MemoryIndex.cpp:559-570 drops them).

The data tables are machine-extracted from the reference by
``tools/extract_arabic_tables.py`` into ``data/arabic_tables.py``; the
algorithm here is an original implementation of the published
Larkey/Ballesteros/Connell light-stemming method (SIGIR 2002).
"""

from __future__ import annotations

from .data.arabic_tables import DEF_ARTICLES, NORM_PAIRS, STOP_WORDS, SUFFIXES

ARABIC_RANGE_LOW = 0x0600
ARABIC_RANGE_HIGH = 0x06FF
_WAW = "و"

# str.translate table: Arabic-block codepoints default to deletion (None);
# table entries override with their normalized codepoint. Codepoints outside
# the block are absent from the dict and pass through unchanged — the same
# three-way branch as the reference's arabic_norm2_unicode (:792-802).
_NORM2 = {cp: None for cp in range(ARABIC_RANGE_LOW, ARABIC_RANGE_HIGH + 1)}
_NORM2.update({src: dst for src, dst in NORM_PAIRS})

_STOP_SET = frozenset(STOP_WORDS)


def arabic_norm2(word: str) -> str:
    """Normalize: drop diacritics/tatweel, fold alef/teh-marbuta/maqsura."""
    return word.translate(_NORM2)


def _strip_article(word: str) -> str:
    """Strip the first matching definite article; remainder must keep more
    than len(article)+1 chars (ref :728-734, ``wordlen > len+1``)."""
    n = len(word)
    for art in DEF_ARTICLES:
        if n > len(art) + 1 and word.startswith(art):
            return word[len(art):]
    return word


def _strip_suffixes(word: str, lenlimit: int = 1) -> str:
    """Strip each suffix once, in table order, against the progressively
    truncated word; each strip requires the current word to keep more than
    len(suffix)+lenlimit chars (ref :755-762)."""
    for suf in SUFFIXES:
        if len(word) > len(suf) + lenlimit and word.endswith(suf):
            word = word[: -len(suf)]
    return word


def _light10_tail(norm: str) -> str:
    """The shared light10 steps applied to an already-normalized word."""
    if norm[:1] == _WAW and len(norm) > 3:
        norm = norm[1:]
    word = _strip_article(norm)
    if len(word) > 2:
        return _strip_suffixes(word, 1)
    return word


def arabic_light10(word: str) -> str:
    return _light10_tail(arabic_norm2(word))


def arabic_light10_stop(word: str) -> str:
    norm = arabic_norm2(word)
    if norm in _STOP_SET:
        return ""
    return _light10_tail(norm)


def arabic_stop(word: str) -> str:
    return "" if word in _STOP_SET else word


def arabic_norm2_stop(word: str) -> str:
    norm = arabic_norm2(word)
    return "" if norm in _STOP_SET else norm


_DISPATCH = {
    "none": lambda w: w,
    "arabic_stop": arabic_stop,
    "arabic_norm2": arabic_norm2,
    "arabic_norm2_stop": arabic_norm2_stop,
    "arabic_light10": arabic_light10,
    "arabic_light10_stop": arabic_light10_stop,
}

# the IndexConfig-selectable mode names (everything but the identity)
ARABIC_STEMMER_MODES = tuple(k for k in _DISPATCH if k != "none")


class ArabicStemmer:
    """Callable-table dispatch like the reference's ``stemtable_unicode``
    (ref:src/Arabic_Stemmer_utf8.cpp:664-690); unknown mode raises, matching
    the ``LEMUR_BAD_PARAMETER_ERROR`` throw (:681-684)."""

    def __init__(self, mode: str = "arabic_light10_stop"):
        try:
            self._fn = _DISPATCH[mode]
        except KeyError:
            raise ValueError(f"ArabicStemmer: unknown stem function: {mode!r}")
        self.mode = mode

    def stem(self, word: str) -> str:
        return self._fn(word)
