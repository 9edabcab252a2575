"""ShrinkageBeliefNode semantics pins (ref:src/ShrinkageBeliefNode.cpp).

The score-cache math is tested directly on hand-built document structures
(no index needed); every expected value is computed in the test from the
model's definition, branch by branch."""
import math

import numpy as np
import pytest

from indri_5_5_ray.pipelines.shrinkage import (
    ShrinkageScorer,
    ShrinkageSettings,
    parse_shrinkage_rule,
)


def _scorer(rules=(), method="linear", lam=0.4):
    """Reader-free scorer: only the rule settings and score function are
    exercised by _doc_term_score."""
    sc = ShrinkageScorer.__new__(ShrinkageScorer)
    sc.settings = ShrinkageSettings()
    for r in rules:
        parse_shrinkage_rule(r, sc.settings)
    sc.method = "linear" if method in ("linear", "jm") else method
    sc.lam = lam
    sc.mu = 2500.0
    sc.other_weight = lam if sc.method == "linear" else 0.0
    return sc


def _struct(nodes):
    """nodes = [(ordinal, begin, end, parent, type)] → struct dict."""
    n = max(o for o, *_ in nodes)
    begin = np.zeros(n + 1, np.int64)
    end = np.zeros(n + 1, np.int64)
    parent = np.zeros(n + 1, np.int64)
    ftype = [""] * (n + 1)
    for o, b, e, p, t in nodes:
        begin[o], end[o], parent[o], ftype[o] = b, e, p, t
    children = [[] for _ in range(n + 1)]
    for o in range(1, n + 1):
        children[parent[o]].append(o)
    return {"begin": begin, "end": end, "parent": parent, "type": ftype,
            "children": children, "n": n}


def test_rule_parsing():
    s = ShrinkageSettings()
    parse_shrinkage_rule("parentWeight:0.25,docWeight:0.3,recursive:true", s)
    parse_shrinkage_rule("field:title,weight:0.4,length:true", s)
    parse_shrinkage_rule("weight:0.9", s)  # no field -> dropped
    assert s.parent_weight == 0.25 and s.doc_weight == 0.3 and s.recursive
    assert not s.query_level_combine
    assert list(s.rules) == ["title"]
    assert s.rules["title"].weight == 0.4
    assert s.rules["title"].length_proportional


def test_flat_tree_linear_matches_hand_math():
    # doc: 10 tokens; one root node sec=[0,6); term at positions 1,3 (in
    # sec) and 8 (outside).  λ=0.4, parentWeight 0.1, docWeight 0.2.
    sc = _scorer(["parentWeight:0.1,docWeight:0.2"])
    st = _struct([(1, 0, 6, 0, "sec")])
    p_c = 0.01
    got = sc._doc_term_score(st, np.array([1, 3, 8]), 10, p_c)
    base0 = 0.6 * 3 / 10 + 0.4 * p_c
    b_sec = (0.6 * 2 / 6 + 0.4 * p_c - 0.4 * p_c) / 0.6  # == MLE 2/6
    d_sec = 0.8 * b_sec + 0.2 * base0
    want = math.log(0.6 * d_sec + 0.4 * p_c)
    assert got == pytest.approx(want, rel=1e-12)


def test_unmatched_tree_excluded_and_default_path():
    # two root trees; term only in the first → the second tree's node keeps
    # score 0 and is excluded from the average (matched-roots walk)
    sc = _scorer(["docWeight:0.2"])
    st = _struct([(1, 0, 4, 0, "a"), (2, 4, 8, 0, "b")])
    p_c = 0.05
    got = sc._doc_term_score(st, np.array([1]), 9, p_c)
    base0 = 0.6 / 9 + 0.4 * p_c
    d_a = 0.8 * ((0.6 * 1 / 4 + 0.4 * p_c - 0.4 * p_c) / 0.6) + 0.2 * base0
    assert got == pytest.approx(math.log(0.6 * d_a + 0.4 * p_c), rel=1e-12)
    # no occurrences at all → the default score docW·base0 + (1-docW)·λp
    got0 = sc._doc_term_score(st, np.array([], np.int64), 9, p_c)
    base0_0 = 0.4 * p_c
    want0 = 0.2 * base0_0 + 0.8 * (0.4 * p_c)
    assert got0 == pytest.approx(math.log(want0), rel=1e-12)
    # no structure at all → same default with the real base0
    gotn = sc._doc_term_score(None, np.array([1]), 9, p_c)
    wantn = 0.2 * (0.6 / 9 + 0.4 * p_c) + 0.8 * (0.4 * p_c)
    assert gotn == pytest.approx(math.log(wantn), rel=1e-12)


def test_absolute_rule_and_overweight_branch():
    # sec=[0,6) with child title=[0,2); term at 0,1 (title) and 4 (sec only)
    st = _struct([(1, 0, 6, 0, "sec"), (2, 0, 2, 1, "title")])
    p_c = 0.02
    pos = np.array([0, 1, 4])
    # absolute rule weight 0.3: up_sec = 0.7·b_sec + 0.3·b_title
    sc = _scorer(["docWeight:0.2,parentWeight:0.1", "field:title,weight:0.3"])
    got = sc._doc_term_score(st, pos, 7, p_c)
    base0 = 0.6 * 3 / 7 + 0.4 * p_c
    b_sec, b_title = 3 / 6, 2 / 2
    u_sec = 0.7 * b_sec + 0.3 * b_title
    d_sec = 0.8 * u_sec + 0.2 * base0
    d_title = 0.7 * b_title + 0.1 * u_sec + 0.2 * base0
    want = math.log((0.6 * d_sec + 0.4 * p_c + 0.6 * d_title + 0.4 * p_c) / 2)
    assert got == pytest.approx(want, rel=1e-12)
    # rule weights summing past 1 → absolute weights ignored, up = relative
    sc2 = _scorer(["docWeight:0.2,parentWeight:0.1",
                   "field:title,weight:1.5"])
    got2 = sc2._doc_term_score(st, pos, 7, p_c)
    u_sec2 = b_sec  # relative-only fallback (remaining < 0)
    d_sec2 = 0.8 * u_sec2 + 0.2 * base0
    d_title2 = 0.7 * b_title + 0.1 * u_sec2 + 0.2 * base0
    want2 = math.log(
        (0.6 * d_sec2 + 0.4 * p_c + 0.6 * d_title2 + 0.4 * p_c) / 2)
    assert got2 == pytest.approx(want2, rel=1e-12)


def test_length_proportional_rule():
    st = _struct([(1, 0, 6, 0, "sec"), (2, 0, 2, 1, "title")])
    p_c = 0.02
    pos = np.array([0, 1, 4])
    sc = _scorer(["docWeight:0.2,parentWeight:0.1",
                  "field:title,weight:0.5,length:true"])
    got = sc._doc_term_score(st, pos, 7, p_c)
    base0 = 0.6 * 3 / 7 + 0.4 * p_c
    b_sec, b_title = 3 / 6, 2 / 2
    alpha = 0.5 * 2  # weight · child accumulated length
    u_sec = (b_sec * 6 + alpha * b_title) / (6 + alpha)
    d_sec = 0.8 * u_sec + 0.2 * base0
    d_title = 0.7 * b_title + 0.1 * u_sec + 0.2 * base0
    want = math.log((0.6 * d_sec + 0.4 * p_c + 0.6 * d_title + 0.4 * p_c) / 2)
    assert got == pytest.approx(want, rel=1e-12)


def test_recursive_mixes_shrunk_parent():
    # three-level chain sec{p{title}}: recursive mode mixes the parent's
    # DOWN (already shrunk) estimate and the child rule mixes up[kid]
    st = _struct([(1, 0, 6, 0, "sec"), (2, 0, 4, 1, "p"),
                  (3, 0, 2, 2, "title")])
    p_c = 0.02
    pos = np.array([0, 1, 3])
    sc = _scorer(["docWeight:0.2,parentWeight:0.1,recursive:true",
                  "field:title,weight:0.3"])
    got = sc._doc_term_score(st, pos, 7, p_c)
    base0 = 0.6 * 3 / 7 + 0.4 * p_c
    b_sec, b_p, b_title = 3 / 6, 3 / 4, 2 / 2
    u_title = b_title
    u_p = 0.7 * b_p + 0.3 * u_title       # recursive: up[kid] (same here)
    u_sec = b_sec                          # p has no rule
    d_sec = 0.8 * u_sec + 0.2 * base0
    d_p = 0.7 * u_p + 0.1 * d_sec + 0.2 * base0     # parent's DOWN
    d_title = 0.7 * u_title + 0.1 * d_p + 0.2 * base0
    want = math.log(sum(0.6 * x + 0.4 * p_c
                        for x in (d_sec, d_p, d_title)) / 3)
    assert got == pytest.approx(want, rel=1e-12)


def test_zero_length_node_falls_back_to_base():
    # an empty extent (begin == end) has divisor 0 → up = base branch
    st = _struct([(1, 0, 0, 0, "sec")])
    sc = _scorer(["docWeight:0.2"])
    p_c = 0.05
    got = sc._doc_term_score(st, np.array([], np.int64), 4, p_c)
    # no occurrences → unmatched tree → default
    want = 0.2 * (0.4 * p_c) + 0.8 * (0.4 * p_c)
    assert got == pytest.approx(math.log(want), rel=1e-12)


def test_query_level_combine_stays_in_log_space():
    sc = _scorer(["docWeight:0.2,queryLevelCombine:true"])
    st = _struct([(1, 0, 6, 0, "sec")])
    p_c = 0.01
    got = sc._doc_term_score(st, np.array([1, 3]), 10, p_c)
    base0 = math.log(0.6 * 2 / 10 + 0.4 * p_c)       # stays a log-score
    b_sec = math.log(0.6 * 2 / 6 + 0.4 * p_c)        # no subtraction
    d_sec = 0.8 * b_sec + 0.2 * base0                # linear mix of logs
    assert got == pytest.approx(d_sec, rel=1e-12)    # no final log
