"""Krovetz stemmer — from-scratch Python implementation of the kstem algorithm.

Re-implements the rule cascade and dictionary semantics of the reference
(ref:src/KrovetzStemmer.cpp:76-1116; rule order comment :1046-1054; driver
:995-1116).  The embedded dictionary word lists (exceptions, direct
conflations, headwords) are pure data extracted to ``data/kstem_dict.py``.

Semantics pinned:

* words shorter than 3 chars, length ≥ 25 (``MAX_WORD_LENGTH``,
  ref:include/indri/KrovetzStemmer.hpp:49) or containing any non-alpha char
  are NOT stemmed — just lowercased (ref:src/KrovetzStemmer.cpp:1004-1021);
* the cascade checks the dictionary after every step: plural → past_tense →
  aspect → ity → ness → ion → er/or → ly → al → ive → ize → ment → ble →
  ism → ic → ncy → nce (ref:src/KrovetzStemmer.cpp:1057-1097);
* a final direct-root mapping applies dictionary conflations
  (``Italians`` → ``Italy``) (ref:src/KrovetzStemmer.cpp:1099-1103);
* ``ends()`` requires the word to be strictly longer than the suffix
  (``sufflength > k`` test, ref:src/KrovetzStemmer.cpp:176-185).

The C implementation mutates a NUL-terminated char buffer in place, sometimes
restoring bytes beyond the terminator; this port reproduces that exactly with
an explicit char-list buffer and ``\\0`` sentinels, so every lookup sees the
same string the reference would.
"""

from __future__ import annotations

from .data.kstem_dict import CONFLATIONS, EXCEPTIONS, HEADWORDS

MAX_WORD_LENGTH = 25  # ref:include/indri/KrovetzStemmer.hpp:49

_VOWELS = frozenset("aeiou")
_ASCII_LOWER_MAP = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)


def _build_dict() -> dict[str, tuple[bool, str]]:
    """variant → (is_exception, root); first entry wins on duplicates
    (ref:src/KrovetzStemmer.cpp kstem_add_table_entry)."""
    d: dict[str, tuple[bool, str]] = {}
    for w in EXCEPTIONS:
        d.setdefault(w, (True, ""))
    for w in HEADWORDS:
        d.setdefault(w, (False, ""))
    for variant, root in CONFLATIONS:
        d.setdefault(variant, (False, root))
    return d


_DICT = _build_dict()


class KrovetzStemmer:
    """One stemmer instance = one actor's worth of state (dict + cache).

    The reference guards its 30013-slot cache with a mutex
    (ref:include/indri/KrovetzStemmer.hpp:83-171); an actor is single-threaded
    so a plain dict cache suffices and is semantics-identical (exact-key).
    """

    def __init__(self) -> None:
        self._cache: dict[str, str] = {}
        # buffer state (mirrors C: word/j/k)
        self._b: list[str] = []
        self._j = 0
        self._k = 0

    # -- buffer helpers ----------------------------------------------------

    def _word(self) -> str:
        """Current NUL-terminated string value of the buffer."""
        b = self._b
        try:
            return "".join(b[: b.index("\0")])
        except ValueError:
            return "".join(b)

    def _lookup(self) -> bool:
        w = self._word()
        return len(w) > 1 and w in _DICT  # getdep skips len<=1

    def _getdep(self) -> tuple[bool, str] | None:
        w = self._word()
        if len(w) <= 1:
            return None
        return _DICT.get(w)

    def _cons(self, i: int) -> bool:
        ch = self._b[i]
        if ch in _VOWELS:
            return False
        if ch != "y" or i == 0:
            return True
        return self._b[i - 1] in _VOWELS

    def _vowel(self, i: int) -> bool:
        return not self._cons(i)

    def _vowelinstem(self) -> bool:
        return any(self._vowel(i) for i in range(self._j + 1))

    def _doublec(self, i: int) -> bool:
        if i < 1:
            return False
        if self._b[i] != self._b[i - 1]:
            return False
        return self._cons(i)

    def _ends_in(self, s: str) -> bool:
        sufflength = len(s)
        wordlength = self._k + 1
        if sufflength > self._k:
            self._j = self._k
            return False
        r = wordlength - sufflength
        match = self._word()[r:] == s if r <= len(self._word()) else False
        self._j = (r - 1) if match else self._k
        return match

    def _setsuffix(self, s: str) -> None:
        j = self._j
        for i, c in enumerate(s):
            self._b[j + 1 + i] = c
        self._b[j + 1 + len(s)] = "\0"
        self._k = j + len(s)

    def _set(self, idx: int, val: str) -> None:
        self._b[idx] = val

    # -- rule cascade (each mirrors its reference function) -----------------

    def _plural(self) -> None:  # ref:src/KrovetzStemmer.cpp:198-246
        b, k = self._b, self._k
        if b[k] != "s":
            return
        if self._ends_in("ies"):
            j = self._j
            b[j + 3] = "\0"
            self._k -= 1
            if self._lookup():  # calories -> calorie
                return
            self._k += 1
            b[j + 3] = "s"
            self._setsuffix("y")
            return
        if self._ends_in("es"):
            j = self._j
            b[j + 2] = "\0"
            self._k -= 1
            # aides -> aide, but prevent crosses -> crosse
            if self._lookup() and j > 0 and not (b[j] == "s" and b[j - 1] == "s"):
                return
            b[j + 1] = "\0"
            self._k -= 1
            if self._lookup():
                return
            b[j + 1] = "e"
            b[j + 2] = "\0"
            self._k += 1
            return
        if self._k + 1 > 3 and b[self._k - 1] != "s" and not self._ends_in("ous"):
            # unless the word ends in "ous" or a double "s", remove the final "s"
            b[self._k] = "\0"
            self._k -= 1

    def _past_tense(self) -> None:  # ref:src/KrovetzStemmer.cpp:250-323
        b = self._b
        if self._k + 1 <= 4:
            return
        if self._ends_in("ied"):
            j = self._j
            b[j + 3] = "\0"
            self._k -= 1
            if self._lookup():  # died -> die
                return
            self._k += 1
            b[j + 3] = "d"
            self._setsuffix("y")
            return
        if self._ends_in("ed") and self._vowelinstem():
            j = self._j
            b[j + 2] = "\0"
            self._k = j + 1
            dep = self._getdep()
            if dep is not None and not dep[0]:
                return  # in dictionary and not an exception
            b[j + 1] = "\0"
            self._k = j
            if self._lookup():
                return
            if self._doublec(self._k):
                b[self._k] = "\0"
                self._k -= 1
                if self._lookup():
                    return
                b[self._k + 1] = b[self._k]
                self._k += 1
                return
            if b[0] == "u" and b[1] == "n":  # un- prefix: leave alone
                b[self._k + 1] = "e"
                b[self._k + 2] = "d"
                b[self._k + 3] = "\0"
                self._k += 2
                return
            b[j + 1] = "e"  # default: end with 'e' (microcoded -> microcode)
            b[j + 2] = "\0"
            self._k = j + 1

    def _aspect(self) -> None:  # ref:src/KrovetzStemmer.cpp:327-395
        b = self._b
        if self._k + 1 <= 5:
            return
        if self._ends_in("ing") and self._vowelinstem():
            j = self._j
            b[j + 1] = "e"
            b[j + 2] = "\0"
            self._k = j + 1
            dep = self._getdep()
            if dep is not None and not dep[0]:
                return
            b[self._k] = "\0"
            self._k -= 1
            if self._lookup():
                return
            if self._doublec(self._k):
                self._k -= 1
                b[self._k + 1] = "\0"
                if self._lookup():
                    return
                b[self._k + 1] = b[self._k]
                self._k += 1
                return
            if j > 0 and self._cons(j) and self._cons(j - 1):
                self._k = j
                b[self._k + 1] = "\0"
                return
            b[j + 1] = "e"
            b[j + 2] = "\0"
            self._k = j + 1

    def _ity_endings(self) -> None:  # ref:src/KrovetzStemmer.cpp:705-762
        b = self._b
        old_k = self._k
        if self._ends_in("ity"):
            j = self._j
            b[j + 1] = "\0"
            self._k = j
            if self._lookup():
                return
            b[j + 1] = "e"
            b[j + 2] = "\0"
            self._k = j + 1
            if self._lookup():
                return
            b[j + 1] = "i"
            b[j + 2] = "t"
            self._k = old_k
            if j > 0 and b[j - 1] == "i" and b[j] == "l":  # -ability/-ibility -> -ble
                b[j - 1] = "l"
                b[j] = "e"
                b[j + 1] = "\0"
                self._k = j
                return
            if j > 0 and b[j - 1] == "i" and b[j] == "v":  # -ivity -> -ive
                b[j + 1] = "e"
                b[j + 2] = "\0"
                self._k = j + 1
                return
            if j > 0 and b[j - 1] == "a" and b[j] == "l":  # -ality: remove -ity
                b[j + 1] = "\0"
                self._k = j
                return
            if self._lookup():  # immunity stays if variant in dict
                return
            b[j + 1] = "\0"
            self._k = j

    def _ness_endings(self) -> None:  # ref:src/KrovetzStemmer.cpp:812-821
        b = self._b
        if self._ends_in("ness"):
            j = self._j
            b[j + 1] = "\0"
            self._k = j
            if b[j] == "i":
                b[j] = "y"

    def _ion_endings(self) -> None:  # ref:src/KrovetzStemmer.cpp:327-418
        b = self._b
        old_k = self._k
        if self._ends_in("ization"):  # -> -ize
            j = self._j
            b[j + 3] = "e"
            b[j + 4] = "\0"
            self._k = j + 3
            return
        if self._ends_in("ition"):
            j = self._j
            b[j + 1] = "e"
            b[j + 2] = "\0"
            self._k = j + 1
            if self._lookup():  # definition -> define
                return
            b[j + 1] = "i"
            b[j + 2] = "t"
            self._k = old_k
        if self._ends_in("ation"):
            j = self._j
            b[j + 3] = "e"
            b[j + 4] = "\0"
            self._k = j + 3
            if self._lookup():  # elimination -> eliminate
                return
            b[j + 1] = "e"
            b[j + 2] = "\0"
            self._k = j + 1
            if self._lookup():  # allegation -> allege
                return
            b[j + 1] = "\0"
            self._k = j
            if self._lookup():  # resignation -> resign
                return
            b[j + 1] = "a"
            b[j + 2] = "t"
            b[j + 3] = "i"
            b[j + 4] = "o"
            self._k = old_k
        if self._ends_in("ication"):
            j = self._j
            b[j + 1] = "y"
            b[j + 2] = "\0"
            self._k = j + 1
            if self._lookup():  # amplification -> amplify
                return
            b[j + 1] = "i"
            b[j + 2] = "c"
            self._k = old_k
        if self._ends_in("ion"):
            j = self._j
            b[j + 1] = "e"
            b[j + 2] = "\0"
            self._k = j + 1
            if self._lookup():
                return
            b[j + 1] = "\0"
            self._k = j
            if self._lookup():
                return
            b[j + 1] = "i"
            b[j + 2] = "o"
            self._k = old_k

    def _er_and_or_endings(self) -> None:  # ref:src/KrovetzStemmer.cpp:423-484
        b = self._b
        old_k = self._k
        if self._ends_in("izer"):
            j = self._j
            b[j + 4] = "\0"
            self._k = j + 3
            return
        if self._ends_in("er") or self._ends_in("or"):
            j = self._j
            word_char = b[j + 1]
            if self._doublec(j):
                b[j] = "\0"
                self._k = j - 1
                if self._lookup():
                    return
                b[j] = b[j - 1]
            if b[j] == "i":  # -ier
                b[j] = "y"
                b[j + 1] = "\0"
                self._k = j
                if self._lookup():
                    return
                b[j] = "i"
                b[j + 1] = "e"
            if b[j] == "e":  # -eer
                b[j] = "\0"
                self._k = j - 1
                if self._lookup():
                    return
                b[j] = "e"
            b[j + 2] = "\0"  # remove the -r
            self._k = j + 1
            if self._lookup():
                return
            b[j + 1] = "\0"  # remove -er/-or
            self._k = j
            if self._lookup():
                return
            b[j + 1] = "e"  # -or -> -e
            b[j + 2] = "\0"
            self._k = j + 1
            if self._lookup():
                return
            b[j + 1] = word_char
            b[j + 2] = "r"
            b[j + 3] = "\0"
            self._k = old_k

    def _ly_endings(self) -> None:  # ref:src/KrovetzStemmer.cpp:490-529
        b = self._b
        old_k = self._k
        if self._ends_in("ly"):
            j = self._j
            b[j + 2] = "e"  # -ly -> -le
            if self._lookup():
                return
            b[j + 2] = "y"
            b[j + 1] = "\0"  # remove -ly
            self._k = j
            if self._lookup():
                return
            if j > 0 and b[j - 1] == "a" and b[j] == "l":  # -ally -> -al
                return
            b[j + 1] = "l"
            self._k = old_k
            if j > 0 and b[j - 1] == "a" and b[j] == "b":  # -ably -> -able
                b[j + 2] = "e"
                self._k = j + 2
                return
            if b[j] == "i":  # militarily -> military
                b[j] = "y"
                b[j + 1] = "\0"
                self._k = j
                if self._lookup():
                    return
                b[j] = "i"
                b[j + 1] = "l"
                self._k = old_k
            b[j + 1] = "\0"  # default: remove -ly
            self._k = j

    def _al_endings(self) -> None:  # ref:src/KrovetzStemmer.cpp:535-600
        b = self._b
        old_k = self._k
        if self._ends_in("al"):
            j = self._j
            b[j + 1] = "\0"
            self._k = j
            if self._lookup():
                return
            if self._doublec(j):
                b[j] = "\0"
                self._k = j - 1
                if self._lookup():
                    return
                b[j] = b[j - 1]
            b[j + 1] = "e"  # -al -> -e
            b[j + 2] = "\0"
            self._k = j + 1
            if self._lookup():
                return
            b[j + 1] = "u"  # -al -> -um (optimal -> optimum)
            b[j + 2] = "m"
            b[j + 3] = "\0"
            self._k = j + 2
            if self._lookup():
                return
            b[j + 1] = "a"
            b[j + 2] = "l"
            b[j + 3] = "\0"
            self._k = old_k
            if j > 0 and b[j - 1] == "i" and b[j] == "c":
                b[j - 1] = "\0"  # remove -ical
                self._k = j - 2
                if self._lookup():
                    return
                b[j - 1] = "y"  # -ical -> -y (bibliographical)
                b[j] = "\0"
                self._k = j - 1
                if self._lookup():
                    return
                b[j - 1] = "i"
                b[j] = "c"
                b[j + 1] = "\0"  # default: -ical -> -ic
                self._k = j
                return
            if b[j] == "i":  # remove -ial
                b[j] = "\0"
                self._k = j - 1
                if self._lookup():
                    return
                b[j] = "i"
                self._k = old_k

    def _ive_endings(self) -> None:  # ref:src/KrovetzStemmer.cpp:605-648
        b = self._b
        old_k = self._k
        if self._ends_in("ive"):
            j = self._j
            b[j + 1] = "\0"  # remove -ive
            self._k = j
            if self._lookup():
                return
            b[j + 1] = "e"  # -ive -> -e
            b[j + 2] = "\0"
            self._k = j + 1
            if self._lookup():
                return
            b[j + 1] = "i"
            b[j + 2] = "v"
            if j > 0 and b[j - 1] == "a" and b[j] == "t":
                b[j - 1] = "e"  # -ative -> -e (determinative -> determine)
                b[j] = "\0"
                self._k = j - 1
                if self._lookup():
                    return
                b[j - 1] = "\0"  # remove -ative
                if self._lookup():
                    return
                b[j - 1] = "a"
                b[j] = "t"
                self._k = old_k
            b[j + 2] = "o"  # -ive -> -ion (injunctive -> injunction)
            b[j + 3] = "n"
            if self._lookup():
                return
            b[j + 2] = "v"
            b[j + 3] = "e"
            self._k = old_k

    def _ize_endings(self) -> None:  # ref:src/KrovetzStemmer.cpp:652-681
        b = self._b
        old_k = self._k
        if self._ends_in("ize"):
            j = self._j
            b[j + 1] = "\0"  # remove -ize
            self._k = j
            if self._lookup():
                return
            b[j + 1] = "i"
            if self._doublec(j):
                b[j] = "\0"
                self._k = j - 1
                if self._lookup():
                    return
                b[j] = b[j - 1]
            b[j + 1] = "e"  # -ize -> -e
            b[j + 2] = "\0"
            self._k = j + 1
            if self._lookup():
                return
            b[j + 1] = "i"
            b[j + 2] = "z"
            self._k = old_k

    def _ment_endings(self) -> None:  # ref:src/KrovetzStemmer.cpp:685-698
        b = self._b
        old_k = self._k
        if self._ends_in("ment"):
            j = self._j
            b[j + 1] = "\0"
            self._k = j
            if self._lookup():
                return
            b[j + 1] = "m"
            self._k = old_k

    def _ble_endings(self) -> None:  # ref:src/KrovetzStemmer.cpp:766-808
        b = self._b
        old_k = self._k
        if self._ends_in("ble"):
            j = self._j
            if b[j] not in ("a", "i"):
                return
            word_char = b[j]
            b[j] = "\0"  # remove -able/-ible
            self._k = j - 1
            if self._lookup():
                return
            if self._doublec(self._k):
                b[self._k] = "\0"
                self._k -= 1
                if self._lookup():
                    return
                self._k += 1
                b[self._k] = b[self._k - 1]
            b[j] = "e"  # -a/ible -> -e
            b[j + 1] = "\0"
            self._k = j
            if self._lookup():
                return
            b[j] = "a"  # -able -> -ate (compensable -> compensate)
            b[j + 1] = "t"
            b[j + 2] = "e"
            b[j + 3] = "\0"
            self._k = j + 2
            if self._lookup():
                return
            b[j] = word_char
            b[j + 1] = "b"
            b[j + 2] = "l"
            b[j + 3] = "e"
            self._k = old_k

    def _ism_endings(self) -> None:  # ref:src/KrovetzStemmer.cpp:825-832
        if self._ends_in("ism"):
            j = self._j
            self._b[j + 1] = "\0"
            self._k = j

    def _ic_endings(self) -> None:  # ref:src/KrovetzStemmer.cpp:838-869
        b = self._b
        if self._ends_in("ic"):
            j = self._j
            b[j + 3] = "a"  # -ic -> -ical
            b[j + 4] = "l"
            b[j + 5] = "\0"
            self._k = j + 4
            if self._lookup():
                return
            b[j + 1] = "y"  # -ic -> -y
            b[j + 2] = "\0"
            self._k = j + 1
            if self._lookup():
                return
            b[j + 1] = "e"  # -ic -> -e
            if self._lookup():
                return
            b[j + 1] = "\0"  # remove -ic
            self._k = j
            if self._lookup():
                return
            b[j + 1] = "i"
            b[j + 2] = "c"
            b[j + 3] = "\0"
            self._k = j + 2

    def _ncy_endings(self) -> None:  # ref:src/KrovetzStemmer.cpp:873-890
        b = self._b
        if self._ends_in("ncy"):
            j = self._j
            if b[j] not in ("e", "a"):
                return
            b[j + 2] = "t"  # -ncy -> -nt (constituency -> constituent)
            b[j + 3] = "\0"
            self._k = j + 2
            if self._lookup():
                return
            b[j + 2] = "c"  # default: -ncy -> -nce
            b[j + 3] = "e"
            self._k = j + 3

    def _nce_endings(self) -> None:  # ref:src/KrovetzStemmer.cpp:894-918
        b = self._b
        old_k = self._k
        if self._ends_in("nce"):
            j = self._j
            if b[j] not in ("e", "a"):
                return
            word_char = b[j]
            b[j] = "e"  # adherance -> adhere
            b[j + 1] = "\0"
            self._k = j
            if self._lookup():
                return
            b[j] = "\0"  # disappearance -> disappear
            self._k = j - 1
            if self._lookup():
                return
            b[j] = word_char
            b[j + 1] = "n"
            self._k = old_k

    # -- driver -------------------------------------------------------------

    _CACHE_CAP = 500_000  # the reference bounds its cache at 30013 2-way slots

    def stem(self, term: str) -> str:
        """kstem_stem_tobuffer port (ref:src/KrovetzStemmer.cpp:995-1116)."""
        cached = self._cache.get(term)
        if cached is not None:
            return cached
        if len(self._cache) > KrovetzStemmer._CACHE_CAP:
            self._cache.clear()

        n = len(term)
        if n < 3 or n >= MAX_WORD_LENGTH or not term.isascii() or not term.isalpha():
            # not stemmed — ASCII-lowercased only, as C tolower() is a no-op on
            # non-ASCII bytes (ref:src/KrovetzStemmer.cpp:1016-1020)
            result = term.translate(_ASCII_LOWER_MAP)
            self._cache[term] = result
            return result

        word = term.lower()
        self._b = list(word) + ["\0"] * 8  # room for expanding rules (-ic -> -ical)
        self._k = n - 1
        self._j = self._k

        dep = None
        while True:
            dep = self._getdep()
            if dep is not None:
                break
            for rule in (
                self._plural, self._past_tense, self._aspect, self._ity_endings,
                self._ness_endings, self._ion_endings, self._er_and_or_endings,
                self._ly_endings, self._al_endings, self._ive_endings,
                self._ize_endings, self._ment_endings, self._ble_endings,
                self._ism_endings, self._ic_endings, self._ncy_endings,
            ):
                rule()
                dep = self._getdep()
                if dep is not None:
                    break
            if dep is None:
                self._nce_endings()
                dep = self._getdep()
            break

        result = self._word()
        if dep is not None and dep[1]:
            result = dep[1]  # direct root mapping (Italians -> Italy)
        self._cache[term] = result
        return result

    def __call__(self, term: str) -> str:
        return self.stem(term)
