"""Reference-semantics pins for the reformulate app
(ref:src/ReformulateQuery.cpp, src/StopStructureRemover.cpp,
src/QueryStopper.cpp) — every expected string below is what the C++
produces byte-for-byte, trailing spaces and all."""
import pyarrow as pa

from indri_5_5_ray.pipelines.reformulate import (
    STOP_STRUCTURES,
    downcase,
    generate_cmufdm_query,
    generate_combine_query,
    generate_fdm_query,
    generate_sdm_query,
    lite_stop,
    make_indri_friendly,
    queries_to_param_xml,
    reformulate,
    reformulate_batch,
    remove_stop_structures,
)


def test_stop_structures_first_match_in_array_order():
    # "why do people think " (index 12) precedes "why do " (13) and
    # "why " (14): the FIRST match in array order wins, not the longest
    # (ref:src/StopStructureRemover.cpp:263-272)
    assert remove_stop_structures("why do people think spark window") == \
        "spark window"
    # "what is the " precedes "what is " in the array
    assert remove_stop_structures("what is the merge data") == "merge data"
    # prefix only: a structure mid-string does not match
    assert remove_stop_structures("merge why do data") == "merge why do data"
    # exactly one structure is removed, never two
    assert remove_stop_structures("the the merge") == "the merge"
    assert len(STOP_STRUCTURES) == 246  # == the reference array's count
    assert all(s.endswith(" ") for s in STOP_STRUCTURES)


def test_lite_stop_keeps_trailing_space_and_drops_empties():
    # ref:src/QueryStopper.cpp:34-48 — kept tokens rejoined token+" ";
    # doubled spaces yield empty tokens which match the 18 default-
    # constructed "" slots of the declared-57 array
    assert lite_stop("the merge of data") == "merge data "
    assert lite_stop("merge  data") == "merge data "
    assert lite_stop("the of and") == ""
    assert lite_stop("") == ""


def test_downcase_is_ascii_only():
    assert downcase("MeRgE DATA") == "merge data"
    # non-ASCII passes through (C tolower in the C locale)
    assert downcase("ÄBC") == "Äbc"


def test_make_indri_friendly_sentinel_quirk():
    # ref:src/ReformulateQuery.cpp:74-102 — the forbidden list is scanned
    # up to an 'e' sentinel, so punctuation becomes spaces but 'e' stays
    assert make_indri_friendly("a.b,c?d") == "a b c d"
    assert make_indri_friendly("merge") == "merge"


def test_sdm_exact_strings():
    assert generate_sdm_query(["merge"]) == "#combine(merge)"
    assert generate_sdm_query(["merge", "data"]) == (
        "#weight( 0.85 #combine(merge data) "
        "0.1 #combine(#1(merge data) ) "
        "0.05 #combine(#uw8(merge data) ))")
    assert generate_sdm_query(["a", "b", "c"]) == (
        "#weight( 0.85 #combine(a b c) "
        "0.1 #combine(#1(a b) #1(b c) ) "
        "0.05 #combine(#uw8(a b) #uw8(b c) ))")


def test_sdm_fielded_exact_string():
    # ref:src/ReformulateQuery.cpp:103-138 — #wsum per term/window with
    # the reference's newline-and-space layout
    out = generate_sdm_query(["a", "b"], fields=[("title", "2.0")])
    assert out == (
        "#weight( 0.85 #combine(#wsum( 2.0 a.(title)  )\n "
        "#wsum( 2.0 b.(title)  )\n ) "
        "0.1 #combine(#wsum( 2.0 #1(a b).(title)  )\n) "
        "0.05 #combine(#wsum( 2.0 #uw8(a b).(title)  )\n))")


def test_fdm_exact_strings():
    # every contiguous span, window = 4x span length
    # (ref:src/ReformulateQuery.cpp:273-306)
    assert generate_fdm_query(["a", "b", "c"]) == (
        "#weight( 0.85 #combine(a b c ) "
        "0.1 #combine(#1(a b )\n#1(a b c )\n#1(b c )\n) "
        "0.05 #combine(#uw8(a b )\n#uw12(a b c )\n#uw8(b c )\n))")


def test_cmufdm_single_term_pathological_branch():
    # ref:src/ReformulateQuery.cpp:202-211 — double space after #weight,
    # #1 and #uw4 of a single term
    out = generate_cmufdm_query(["merge"])
    assert "#weight  ( 0.85 merge 0.1 #1(merge) 0.05 #uw4(merge) )" in out
    assert out.startswith("#weight( 1.0 #combine ( #wsum (1.0 merge.(url) ")
    assert "1.0 merge.(inlink))  )" in out


def test_transform_pipeline_and_emptyquery():
    assert reformulate("what is the merge data", {"genSDM": True}) == (
        "#weight( 0.85 #combine(merge data) "
        "0.1 #combine(#1(merge data) ) "
        "0.05 #combine(#uw8(merge data) ))")
    # default generator is plain #combine with the app's spacing
    assert reformulate("What Is The Merge Data") == "#combine( merge data )"
    assert generate_combine_query(["x"]) == "#combine( x )"
    # everything stopped -> the literal EMPTYQUERY sentinel
    assert reformulate("the") == "EMPTYQUERY"
    assert reformulate("is the of and") == "EMPTYQUERY"
    # stopStructures / liteStop are independently disableable
    assert reformulate("the merge", {"stopStructures": False}) == \
        "#combine( merge )"
    assert reformulate("the merge", {"liteStop": False,
                                     "stopStructures": False}) == \
        "#combine( the merge )"


def test_param_xml_output_shape():
    xml = queries_to_param_xml([("7", "what is the merge data")])
    assert xml == ("<parameters>\n"
                   "<query><number>7</number>\n"
                   "<text>#combine( merge data )</text>\n"
                   "</query>\n"
                   "</parameters>\n")


def test_reformulate_batch_map_stage():
    batch = pa.table({"text": ["what is the merge data", "the"]})
    out = reformulate_batch(batch, {"genSDM": True})
    assert out.column("reformulated").to_pylist() == [
        "#weight( 0.85 #combine(merge data) 0.1 #combine(#1(merge data) ) "
        "0.05 #combine(#uw8(merge data) ))",
        "EMPTYQUERY",
    ]
