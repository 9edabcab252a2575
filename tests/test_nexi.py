"""NEXI grammar pins (ref:src/nexilang.g) — AST shapes, the grammar's
quirks, and the dialect translation."""
import pytest

from indri_5_5_ray.pipelines.nexi import (
    CombineNode,
    ContextInclusion,
    ExtentEnforcement,
    ExtentOr,
    ExtentRestriction,
    Field,
    FieldGreater,
    FieldLess,
    FieldWildcard,
    LengthPrior,
    MaxNode,
    NestedExtentInside,
    NexiParseError,
    NexiParser,
    NexiTranslationError,
    NotNode,
    ODNode,
    OrNode,
    RawScorer,
    parse_nexi,
)


def _parse(text, shrinkage=False):
    return NexiParser(shrinkage=shrinkage).parse(text)


def test_bare_term_list_ast():
    q = _parse("merge data")
    assert isinstance(q, LengthPrior) and q.exponent == 0.0
    r = q.child
    assert isinstance(r, ExtentRestriction)
    assert isinstance(r.extent, FieldWildcard)
    c = r.child
    assert isinstance(c, CombineNode) and len(c.children) == 2
    assert all(isinstance(t, RawScorer) for t in c.children)
    # single term: no combine wrapper (termList returns the term itself)
    q1 = _parse("merge")
    assert isinstance(q1.child.child, RawScorer)


def test_shrinkage_flag_marks_scorers():
    q = _parse("merge", shrinkage=True)
    assert q.child.child.shrinkage is True
    q2 = _parse("merge", shrinkage=False)
    assert q2.child.child.shrinkage is False


def test_restricted_query_ast_and_path():
    q = _parse("//article//sec[about(., ray)]")
    r = q.child
    assert isinstance(r, ExtentRestriction)
    p = r.extent
    assert isinstance(p, NestedExtentInside)
    assert isinstance(p.outer, Field) and p.outer.name == "article"
    assert isinstance(p.inner, Field) and p.inner.name == "sec"


def test_about_dot_is_bare_term_list_no_max():
    # about(., terms) returns the termList directly (no restriction, no
    # Max — the grammar's ("," s=termList) branch)
    q = _parse("//sec[about(., merge data)]")
    clause = q.child.child
    assert isinstance(clause, CombineNode)


def test_about_with_path_wraps_in_max():
    q = _parse("//sec[about(.//title, merge)]")
    clause = q.child.child
    assert isinstance(clause, MaxNode)
    assert isinstance(clause.children[0], ExtentRestriction)
    assert clause.children[0].extent.name == "title"


def test_single_logical_connector_only():
    assert isinstance(_parse("//a[about(., x) AND about(., y)]").child.child,
                      CombineNode)
    assert isinstance(_parse("//a[about(., x) OR about(., y)]").child.child,
                      OrNode)
    with pytest.raises(NexiParseError):
        _parse("//a[about(., x) AND about(., y) AND about(., z)]")


def test_arithmetic_adjustments():
    # <= n lowers to Less(n+1), >= n to Greater(n-1) (grammar actions)
    lt = _parse("//a[.//size < 10]").child.child.children[0].raw
    le = _parse("//a[.//size <= 10]").child.child.children[0].raw
    gt = _parse("//a[.//size > 10]").child.child.children[0].raw
    ge = _parse("//a[.//size >= 10]").child.child.children[0].raw
    assert isinstance(lt, FieldLess) and lt.value == 10
    assert isinstance(le, FieldLess) and le.value == 11
    assert isinstance(gt, FieldGreater) and gt.value == 10
    assert isinstance(ge, FieldGreater) and ge.value == 9
    # the arithmetic filter is wrapped scorer + Max (grammar rule filter)
    m = _parse("//a[.//size < 10]").child.child
    assert isinstance(m, MaxNode)


def test_quoted_phrase_and_signs():
    q = _parse('"merge data" -token +extra')
    kids = q.child.child.children
    assert isinstance(kids[0].raw, ODNode)
    assert [t.text for t in kids[0].raw.children] == ["merge", "data"]
    assert isinstance(kids[1], NotNode)
    assert isinstance(kids[2], RawScorer)  # +term accepted, sign dropped


def test_field_alternatives_and_two_restriction_form():
    q = _parse("//(a|b)[about(., x)]")
    assert isinstance(q.child.extent, ExtentOr)
    q2 = _parse("//a[about(., x)]//b[about(., y)]")
    assert isinstance(q2.child, ExtentEnforcement)
    assert isinstance(q2.child.child, ContextInclusion)
    # both parse but refuse translation, naming the construct
    with pytest.raises(NexiTranslationError):
        parse_nexi("//(a|b)[about(., x)]")
    with pytest.raises(NexiTranslationError):
        parse_nexi("//a[about(., x)]//b[about(., y)]")


def test_translations():
    assert parse_nexi("//sec[about(., merge data)]") == \
        "#combine[sec](#combine(merge data))"
    assert parse_nexi("merge data token") == "#combine(merge data token)"
    assert parse_nexi('"merge data" token') == \
        "#combine(#1(merge data) token)"
    assert parse_nexi("//sec[about(., merge) OR about(., data)]") == \
        "#combine[sec](#or(merge data))"
    assert parse_nexi("merge -token data") == \
        "#combine(merge #not(token) data)"
    assert parse_nexi("//sec[about(.//title, merge)]") == \
        "#combine[sec](#max(#combine[.//title](merge)))"
    assert parse_nexi("//article//sec[about(., ray)]") == \
        "#combine[article](#combine[.//sec](ray))"
    assert parse_nexi("//movie[.//year >= 1999]") == \
        "#combine[movie](#max(#greater(year 1998)))"
    # shrinkage scorers never lower silently — translation refuses
    with pytest.raises(NexiTranslationError):
        parse_nexi("//sec[about(., merge)]", shrinkage=True)
    with pytest.raises(NexiTranslationError):
        parse_nexi("merge data", shrinkage=True)


def test_lexer_errors_and_numbers():
    with pytest.raises(NexiParseError):
        _parse("//sec[about(., merge]")  # mismatched parens
    # NUMBER and FLOAT are terms when used in a term list
    q = _parse("merge 42 3.5")
    texts = [t.raw.text for t in q.child.child.children]
    assert texts == ["merge", "42", "3.5"]
    # 'about' used as a term inside the list (rawText accepts ABOUT)
    q2 = _parse("//sec[about(., about)]")
    assert q2.child.child.raw.text == "about"


def test_lexer_astral_plane_passthrough():
    # the reference lexer is byte-oriented: every UTF-8 byte of a
    # supplementary-plane char is >= 0x80, so astral codepoints are TERM
    # characters too (the class extends to \U0010FFFF, not ￿)
    q = _parse("caf\U0001d54f merge")
    c = q.child.child
    assert isinstance(c, CombineNode) and len(c.children) == 2
    assert c.children[0].raw.text == "caf\U0001d54f"
    q2 = _parse("\U0001f600data")
    assert q2.child.child.raw.text == "\U0001f600data"
