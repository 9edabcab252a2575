"""Larkey Arabic stemmer family (ref:src/Arabic_Stemmer_utf8.cpp).

Expected values are hand-traced through the reference's six stemming
functions (norm2 :786-804, article strip :722-735, suffix strip :743-763,
light10 :812-837, stop variants :776-780,806-810,839-868)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from indri_5_5_ray import registry
from indri_5_5_ray.arabic import (
    ArabicStemmer,
    arabic_light10,
    arabic_light10_stop,
    arabic_norm2,
    arabic_norm2_stop,
    arabic_stop,
)
from indri_5_5_ray.config import IndexConfig
from indri_5_5_ray.data.arabic_tables import (
    DEF_ARTICLES,
    NORM_PAIRS,
    STOP_WORDS,
    SUFFIXES,
)
from indri_5_5_ray.sources.corpus import Chunk
from indri_5_5_ray.stages.ingest import IngestWorker, TermProcessor


def test_extracted_table_shapes():
    # ref :31-37 six articles, :39-49 ten suffixes, :51-219 168 entries
    # (162 unique once the reference's set() collapses duplicates), :252-402
    # 47 char→norm pairs
    assert len(DEF_ARTICLES) == 6
    assert len(SUFFIXES) == 10
    assert len(STOP_WORDS) == 168 and len(set(STOP_WORDS)) == 162
    assert len(NORM_PAIRS) == 47
    # strip order is semantic: ال must precede لل; two-char suffixes precede
    # their one-char tails (ها before ه, ية before ة/ي)
    assert DEF_ARTICLES[0] == "ال" and DEF_ARTICLES[-1] == "لل"
    assert SUFFIXES[0] == "ها" and SUFFIXES[-3:] == ["ه", "ة", "ي"]


def test_norm2_drops_diacritics_and_tatweel():
    assert arabic_norm2("كِتَاب") == "كتاب"  # harakat dropped
    assert arabic_norm2("كـتاب") == "كتاب"  # tatweel dropped


def test_norm2_folds_alef_variants_teh_marbuta_maqsura():
    assert arabic_norm2("أإآا") == "اااا"  # alef-hamza forms → bare alef
    assert arabic_norm2("ة") == "ه"  # teh marbuta → heh
    assert arabic_norm2("ى") == "ي"  # alef maqsura → yeh


def test_norm2_passthrough_outside_arabic_block():
    # non-Arabic codepoints pass through untouched (ref :794-795), including
    # ASCII and Arabic presentation forms beyond U+06FF
    assert arabic_norm2("abcكa") == "abcكa"
    assert arabic_norm2("ﭐ") == "ﭐ"


def test_light10_waw_article_suffix_chain():
    # waw + وال... : strip waw, then ال, then ات suffix
    assert arabic_light10("والكتابات") == "كتاب"
    # article strip leaves 2 chars (4 > 2+1) and the 2-char remainder skips
    # the suffix pass (needs > 2)
    assert arabic_light10("الكل") == "كل"
    # article strip needs wordlen > len(article)+1: 3-char الا is unchanged
    assert arabic_light10("الا") == "الا"


def test_light10_waw_needs_four_chars():
    # 3-char وفي: waw kept (needs > 3), trailing ي stripped (3 > 1+1)
    assert arabic_light10("وفي") == "وف"
    # 4-char وفيل: waw stripped, no article/suffix applies
    assert arabic_light10("وفيل") == "فيل"


def test_light10_suffix_cascade_in_table_order():
    # ها strips first, then ان strips from the truncated word
    assert arabic_light10("درسانها") == "درس"


def test_light10_runs_on_normalized_form():
    # ة → ه before suffixing, so the ه suffix rule fires
    assert arabic_light10("مدرسة") == "مدرس"
    # ى → ي before suffixing, so the ي suffix rule fires
    assert arabic_light10("مستشفى") == "مستشف"
    assert arabic_light10("المدرسة") == "مدرس"


def test_stop_variants():
    assert arabic_stop("في") == ""
    # arabic_stop checks the RAW word — the diacritized form is kept
    assert arabic_stop("فِي") == "فِي"
    # norm2_stop / light10_stop check the NORMALIZED form
    assert arabic_norm2_stop("فِي") == ""
    assert arabic_light10_stop("فِي") == ""
    # plain light10 never stops (ref :820 "Should remove stop words here")
    assert arabic_light10("في") == "في"


def test_stop_list_is_not_normalized():
    # faithful reference quirk: أحد is on the list but its normalized form
    # احد is not, so norm2_stop keeps the normalized word
    assert arabic_stop("أحد") == ""
    assert arabic_norm2_stop("أحد") == "احد"


def test_dispatch_modes_and_unknown_raise():
    assert ArabicStemmer("none").stem("أي") == "أي"
    assert ArabicStemmer("arabic_light10_stop").stem("والكتابات") == "كتاب"
    with pytest.raises(ValueError, match="unknown stem function"):
        ArabicStemmer("arabic_light9")


def test_registry_cannot_shadow_arabic_modes():
    with pytest.raises(ValueError, match="shadow"):
        registry.register_stemmer("arabic_light10", lambda t: t)


def test_term_processor_arabic_modes(tmp_path):
    tp = TermProcessor(IndexConfig(stemmer="arabic_light10_stop", stopwords=()))
    assert tp.process("والكتابات") == "كتاب"
    # stopped Arabic word → termID-0 slot (None), like an empty stem
    assert tp.process("في") is None


def test_ingest_end_to_end_arabic(tmp_path):
    t = pa.table({
        "repo": ["r", "r"],
        "path": ["f0", "f1"],
        "commit": ["c" * 40] * 2,
        "lang": ["txt"] * 2,
        "content": ["والكتابات في المدرسة", "مستشفى الكل"],
    })
    p = str(tmp_path / "c.parquet")
    pq.write_table(t, p)
    out = str(tmp_path / "idx")
    cfg = IndexConfig(stemmer="arabic_light10_stop", stopwords=())
    w = IngestWorker(out, cfg.to_dict(), None)
    w._process_chunk(Chunk(file_path=p, row_start=0, row_end=2, doc_id_base=0))
    docs = pq.read_table(f"{out}/docs").sort_by("doc_id")
    # stopped في still counts in dl (termID-0 semantics)
    assert docs.column("dl").to_pylist() == [3, 2]
    part = pq.read_table(f"{out}/partials")
    assert sorted(part.column("term").to_pylist()) == ["كتاب", "كل", "مدرس", "مستشف"]
