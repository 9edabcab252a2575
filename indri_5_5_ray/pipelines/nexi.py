"""NEXI query language — the NexiParser/NexiLexer analogue
(ref:src/nexilang.g, the ANTLR grammar both generated files come from;
ref:src/NexiParser.cpp, ref:src/NexiLexer.cpp).

NEXI (Narrowed Extended XPath I) is INEX's XML-retrieval query language:
``//article//sec[about(., ray data) AND .//year < 2020]``.  The reference
parses it into the same inference-network node types as IndriQL; this
module reproduces the grammar as a recursive-descent parser over an AST
that mirrors those node types one-for-one, then translates the AST into
this engine's IndriQL dialect (:func:`to_indriql`) for execution on
:class:`~.indriql.StructuredQueryEngine`.

Grammar quirks preserved from the reference:

- a clause takes at MOST one logical connector — ``a AND b AND c`` is a
  parse error, exactly as ANTLR's generated parser rejects it
  (``clause : filter (logical filter)?``).
- ``<=`` lowers to ``FieldLess(n+1)`` and ``>=`` to ``FieldGreater(n-1)``
  (grammar actions on LESSEQ/GREATEREQ).
- ``about(., terms)`` (dot only) is the bare term list — NO extent
  restriction and no Max wrapper; ``about(.path field, terms)`` wraps an
  ExtentRestriction in a MaxNode.
- a bare term list query is restricted to FieldWildcard (every field
  extent) and every query is wrapped in ``LengthPrior(0)``.
- ``-term`` applies NotNode; ``+term`` is accepted and ignored; a quoted
  phrase is an ODNode (exact ordered adjacency, #1).
- the two-restriction form ``//a[c1]//b[c2]`` builds ContextInclusion +
  ExtentEnforcement.
- TERM tokens admit letters, digits, ``-``/``_`` and bytes ≥ 0x80 (UTF-8
  passthrough); ``about``/``AND``/``OR`` are keywords (case-sensitive).

Translation notes (documented divergences, each raises or is a no-op):

- ``LengthPrior(q, 0)`` multiplies by ``length^0 = 1`` — dropped.
- the FieldWildcard restriction on a bare term list is dropped: this
  engine ranks DOCUMENTS (the repo-wide convention pinned by every
  field oracle), where the any-field restriction only changes the
  reported extent units, not the document ordering contract.
- ContextInclusion/ExtentEnforcement (the two-restriction form) and
  ExtentOr field lists ``(a|b)`` parse but do not translate to the
  DOCUMENT dialect — ``to_indriql`` raises ``NexiTranslationError``
  naming the construct.  Both EXECUTE at element granularity through
  :func:`run_nexi_extents`: the two-restriction form via
  :func:`~.extents.run_nested_extents` (every grammar shape — plain
  fields, alternative lists, wildcards, second-restriction paths), the
  alternative list via :func:`~.extents.run_extents_wildcard` over the
  named fields, and PATH targets ``//a//b[c]`` via
  :func:`~.extents.run_extents_path` (NestedExtentInsideNode chain
  semantics with ContextCountAccumulator statistics over the chain's
  extent list — the document dialect's nested ``[.//b]`` form instead
  anchors through the tag tree, a documented difference in route).
- ``shrinkage=True`` (the reference's default) wraps term scorers in
  ShrinkageScorerNode; execution for that mode goes through
  :class:`~.shrinkage.ShrinkageScorer` for BARE term lists
  (document-level, :func:`run_nexi`) and through
  ``ShrinkageScorer.score_extents`` for plain-field CAS targets
  (element-level, :func:`run_nexi_extents`).
"""
from __future__ import annotations

import re
from dataclasses import dataclass, field


class NexiParseError(ValueError):
    pass


class NexiTranslationError(ValueError):
    pass


# -- AST (names mirror the reference's indri::lang node types) --------------


@dataclass
class IndexTerm:
    text: str


@dataclass
class ODNode:
    children: list


@dataclass
class Field:
    name: str


@dataclass
class FieldWildcard:
    pass


@dataclass
class ExtentOr:
    fields: list


@dataclass
class NestedExtentInside:
    outer: object
    inner: object | None = None


@dataclass
class RawScorer:
    """NestedRawScorerNode / ShrinkageScorerNode (by the parser's
    shrinkage flag)."""
    raw: object
    shrinkage: bool = False


@dataclass
class MaxNode:
    children: list


@dataclass
class CombineNode:
    children: list


@dataclass
class OrNode:
    children: list


@dataclass
class NotNode:
    child: object


@dataclass
class FieldLess:
    field_name: str
    value: int


@dataclass
class FieldGreater:
    field_name: str
    value: int


@dataclass
class FieldEquals:
    field_name: str
    value: int


@dataclass
class ExtentRestriction:
    child: object
    extent: object


@dataclass
class ContextInclusion:
    children: list
    enforced: object = None


@dataclass
class ExtentEnforcement:
    child: object
    extent: object


@dataclass
class LengthPrior:
    child: object
    exponent: float = 0.0


# -- lexer -------------------------------------------------------------------

_TOKEN_RE = re.compile(
    r"""(?P<ws>[ \t\r\n]+)
      | (?P<dslash>//)
      | (?P<float>[0-9]+\.[0-9]*)
      | (?P<term>[A-Za-z0-9\x80-\U0010ffff][A-Za-z0-9_\-\x80-\U0010ffff]*)
      | (?P<leq><=) | (?P<geq>>=)
      | (?P<ch>[*()\[\]".,/<>=+|-])
    """,
    re.X,
)


def _lex(text: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    i = 0
    while i < len(text):
        m = _TOKEN_RE.match(text, i)
        if not m:
            raise NexiParseError(f"unexpected character {text[i]!r} at {i}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        v = m.group()
        if kind == "term":
            if v == "about":
                out.append(("ABOUT", v))
            elif v == "AND":
                out.append(("AND", v))
            elif v == "OR":
                out.append(("OR", v))
            elif v.isdigit():
                out.append(("NUMBER", v))
            else:
                out.append(("TERM", v))
        elif kind == "float":
            out.append(("FLOAT", v))
        elif kind == "dslash":
            out.append(("DSLASH", v))
        elif kind == "leq":
            out.append(("LEQ", v))
        elif kind == "geq":
            out.append(("GEQ", v))
        else:
            out.append((v, v))
    out.append(("EOF", ""))
    return out


# -- parser ------------------------------------------------------------------


class NexiParser:
    """Recursive descent over the reference grammar (ref:src/nexilang.g
    rules ``query``/``path``/``field``/``clause``/``filter``/
    ``aboutClause``/``arithmeticClause``/``termList``/``term``)."""

    def __init__(self, shrinkage: bool = True):
        self.shrinkage = shrinkage

    # token helpers
    def _peek(self, k: int = 0) -> tuple[str, str]:
        return self.toks[min(self.pos + k, len(self.toks) - 1)]

    def _eat(self, kind: str) -> str:
        t, v = self.toks[self.pos]
        if t != kind:
            raise NexiParseError(f"expected {kind}, got {t}({v!r})")
        self.pos += 1
        return v

    def parse(self, text: str):
        self.toks = _lex(text)
        self.pos = 0
        if self._peek()[0] == "DSLASH":
            q = self._restricted_query()
        else:
            c = self._term_list()
            q = ExtentRestriction(c, FieldWildcard())
        self._eat("EOF")
        return LengthPrior(q, 0.0)

    def _restricted_query(self):
        p, f = self._path_and_field()
        self._eat("[")
        c = self._clause()
        self._eat("]")
        if p is not None:
            self._set_innermost(p, f)
            q = ExtentRestriction(c, p)
        else:
            q = ExtentRestriction(c, f)
        if self._peek()[0] == "DSLASH":
            p2, f2 = self._path_and_field()
            self._eat("[")
            c2 = self._clause()
            self._eat("]")
            if p2 is not None:
                self._set_innermost(p2, f2)
                r2 = ExtentRestriction(c2, p2)
            else:
                r2 = ExtentRestriction(c2, f2)
            # the grammar action adds the RAW first clause (not its
            # ExtentRestriction, which is built then dangles) and encloses
            # with the FIRST field (ref:src/nexilang.g:195-203:
            # combine->addChild(c); combine->addChild(r2, true);
            # ExtentEnforcement(combine, f))
            combine = ContextInclusion([c], enforced=r2)
            return ExtentEnforcement(combine, f)
        return q

    @staticmethod
    def _set_innermost(p: NestedExtentInside, f) -> None:
        pt = p
        while pt.inner is not None:
            pt = pt.inner
        pt.inner = f

    def _path_and_field(self):
        """``path field`` — path consumes all but the last field
        (ref grammar rule ``path``: the ``(field SLASH) =>`` lookahead)."""
        self._eat("DSLASH")
        chain: NestedExtentInside | None = None
        tail: NestedExtentInside | None = None
        while True:
            f = self._field()
            if self._peek()[0] == "DSLASH":
                self.pos += 1
                link = NestedExtentInside(outer=f, inner=None)
                if chain is None:
                    chain = tail = link
                else:
                    tail.inner = link  # type: ignore[union-attr]
                    tail = link
                continue
            return chain, f

    def _field(self):
        t, v = self._peek()
        if t == "*":
            self.pos += 1
            return FieldWildcard()
        if t == "(":
            self.pos += 1
            names = [self._eat("TERM")]
            while self._peek()[0] == "|":
                self.pos += 1
                names.append(self._eat("TERM"))
            self._eat(")")
            return ExtentOr([Field(n) for n in names])
        return Field(self._eat("TERM"))

    def _clause(self):
        s = self._filter()
        t = self._peek()[0]
        if t in ("AND", "OR"):
            self.pos += 1
            c = self._filter()
            node = CombineNode([s, c]) if t == "AND" else OrNode([s, c])
            return node
        return s

    def _filter(self):
        t, v = self._peek()
        if t == "ABOUT":
            return self._about_clause()
        if t == ".":
            a = self._arithmetic_clause()
            s = RawScorer(a, self.shrinkage)
            return MaxNode([s])
        if t == "(":
            self.pos += 1
            s = self._clause()
            self._eat(")")
            return s
        raise NexiParseError(f"expected filter, got {t}({v!r})")

    def _about_clause(self):
        self._eat("ABOUT")
        self._eat("(")
        self._eat(".")
        if self._peek()[0] == ",":
            self.pos += 1
            s = self._term_list()
            self._eat(")")
            return s
        # about(.path field, terms) — path+field exactly as in the query
        # rule (the grammar reuses the same ``path field`` sequence)
        p, last_field = self._path_and_field()
        self._eat(",")
        t = self._term_list()
        self._eat(")")
        if p is not None:
            self._set_innermost(p, last_field)
            r = ExtentRestriction(t, p)
        else:
            r = ExtentRestriction(t, last_field)
        return MaxNode([r])

    def _arithmetic_clause(self):
        self._eat(".")
        # ``. path field op number`` — same path+field sequence; the final
        # element must be a named field (the grammar takes a bare TERM)
        p, last = self._path_and_field()
        if not isinstance(last, Field):
            raise NexiParseError("arithmetic clause needs a named field")
        fname = last.name
        op, _ = self._peek()
        self.pos += 1
        n = int(self._eat("NUMBER"))
        if op == "<":
            c = FieldLess(fname, n)
        elif op == "LEQ":
            c = FieldLess(fname, n + 1)
        elif op == "=":
            c = FieldEquals(fname, n)
        elif op == ">":
            c = FieldGreater(fname, n)
        elif op == "GEQ":
            c = FieldGreater(fname, n - 1)
        else:
            raise NexiParseError(f"expected comparison, got {op}")
        if p is not None:
            self._set_innermost(p, c)
            return p
        return c

    def _term_list(self):
        q = self._term()
        kids = [q]
        while self._peek()[0] in ("TERM", "NUMBER", "FLOAT", "ABOUT", '"',
                                  "+", "-"):
            kids.append(self._term())
        if len(kids) == 1:
            return q
        return CombineNode(kids)

    def _term(self):
        t, v = self._peek()
        if t == "+":
            self.pos += 1
            return self._unrestricted_term()
        if t == "-":
            self.pos += 1
            return NotNode(self._unrestricted_term())
        return self._unrestricted_term()

    def _unrestricted_term(self):
        t, v = self._peek()
        if t == '"':
            self.pos += 1
            kids = []
            while self._peek()[0] in ("TERM", "NUMBER", "FLOAT", "ABOUT"):
                kids.append(IndexTerm(self.toks[self.pos][1]))
                self.pos += 1
            self._eat('"')
            return RawScorer(ODNode(kids), self.shrinkage)
        if t in ("TERM", "NUMBER", "FLOAT", "ABOUT"):
            self.pos += 1
            return RawScorer(IndexTerm(v), self.shrinkage)
        raise NexiParseError(f"expected term, got {t}({v!r})")


# -- translation to this engine's IndriQL dialect ----------------------------


def _path_nodes(p) -> list:
    """NestedExtentInside chain → its AST nodes flattened outermost first
    (``sec`` then ``title`` …); the caller formats each step."""
    parts = []
    node = p
    while isinstance(node, NestedExtentInside):
        parts.append(node.outer)
        node = node.inner
    parts.append(node)
    return parts


def to_indriql(node, _in_restriction: bool = False) -> str:
    """AST → IndriQL text for :class:`~.indriql.StructuredQueryEngine`.
    Raises :class:`NexiTranslationError` on constructs the dialect cannot
    express (ContextInclusion/ExtentEnforcement, ExtentOr, shrinkage
    scorers under a restriction)."""
    if isinstance(node, LengthPrior):
        # exponent 0 ⇒ identity on scores — dropped by design
        return to_indriql(node.child, _in_restriction)
    if isinstance(node, ExtentRestriction):
        ext = node.extent
        if isinstance(ext, FieldWildcard):
            # bare term list: document-level ranking (see module notes)
            return to_indriql(node.child, _in_restriction)
        inner = to_indriql(node.child, True)
        if isinstance(ext, Field):
            lead = ".//" if _in_restriction else ""
            return f"#combine[{lead}{ext.name}]({inner})"
        if isinstance(ext, NestedExtentInside):
            parts = _path_nodes(ext)
            names = []
            for p in parts:
                if isinstance(p, Field):
                    names.append(p.name)
                else:
                    raise NexiTranslationError(
                        f"path element {type(p).__name__} not translatable")
            out = inner
            for name in reversed(names[1:]):
                out = f"#combine[.//{name}]({out})"
            lead = ".//" if _in_restriction else ""
            return f"#combine[{lead}{names[0]}]({out})"
        raise NexiTranslationError(
            f"restriction extent {type(ext).__name__} not translatable")
    if isinstance(node, CombineNode):
        return "#combine(" + " ".join(
            to_indriql(c, _in_restriction) for c in node.children) + ")"
    if isinstance(node, OrNode):
        return "#or(" + " ".join(
            to_indriql(c, _in_restriction) for c in node.children) + ")"
    if isinstance(node, NotNode):
        return f"#not({to_indriql(node.child, _in_restriction)})"
    if isinstance(node, MaxNode):
        return "#max(" + " ".join(
            to_indriql(c, _in_restriction) for c in node.children) + ")"
    if isinstance(node, RawScorer):
        if node.shrinkage:
            raise NexiTranslationError(
                "shrinkage scorers do not lower to the plain dialect "
                "(dropping the flag would silently change scoring) — "
                "use run_nexi(), which routes bare shrinkage term lists "
                "through ShrinkageScorer, or parse with shrinkage=False")
        return to_indriql(node.raw, _in_restriction)
    if isinstance(node, IndexTerm):
        return node.text
    if isinstance(node, ODNode):
        return "#1(" + " ".join(c.text for c in node.children) + ")"
    if isinstance(node, FieldLess):
        return f"#less({node.field_name} {node.value})"
    if isinstance(node, FieldGreater):
        return f"#greater({node.field_name} {node.value})"
    if isinstance(node, FieldEquals):
        return f"#equals({node.field_name} {node.value})"
    if isinstance(node, NestedExtentInside):
        raise NexiTranslationError(
            "bare nested-extent arithmetic paths are not translatable")
    if isinstance(node, (ContextInclusion, ExtentEnforcement)):
        raise NexiTranslationError(
            "the two-restriction form (ContextInclusion/ExtentEnforcement) "
            "is not translatable to this dialect")
    raise NexiTranslationError(f"unhandled node {type(node).__name__}")


def _step_spec(node) -> tuple[str, ...] | None:
    """One path step → field-name tuple (``None`` = the ``*`` wildcard
    step) for :func:`~.extents.run_extents_path` /
    :func:`~.extents._spec_flat`."""
    if isinstance(node, Field):
        return (node.name,)
    if isinstance(node, FieldWildcard):
        return None
    if isinstance(node, ExtentOr):
        if all(isinstance(f, Field) for f in node.fields):
            return tuple(f.name for f in node.fields)
    raise NexiTranslationError(
        f"path step {type(node).__name__} is not executable")


def _chain_steps(p: NestedExtentInside) -> tuple:
    """NEI chain → step tuples outermost first (the innermost slot holds
    the final field after ``_set_innermost``)."""
    steps = []
    node = p
    while isinstance(node, NestedExtentInside):
        steps.append(_step_spec(node.outer))
        node = node.inner
    steps.append(_step_spec(node))
    return tuple(steps)


def _restriction_spec(ext):
    """Restriction extent AST → a :func:`~.extents._spec_flat` spec."""
    if isinstance(ext, Field):
        return ("field", ext.name)
    if isinstance(ext, FieldWildcard):
        return ("ctx", None)
    if isinstance(ext, ExtentOr):
        return ("ctx", _step_spec(ext))
    if isinstance(ext, NestedExtentInside):
        return ("path", _chain_steps(ext))
    raise NexiTranslationError(
        f"restriction extent {type(ext).__name__} is not executable")


def parse_nexi(text: str, shrinkage: bool = False) -> str:
    """NEXI text → IndriQL text (parse + translate).  ``shrinkage``
    mirrors the reference parser's flag; the reference DEFAULTS to true,
    but execution here defaults to false (plain scorers) — see module
    notes."""
    return to_indriql(NexiParser(shrinkage=shrinkage).parse(text))


def run_nexi(reader, text: str, shrinkage: bool = False,
             shrinkage_rules: tuple = (), k: int = 1000):
    """Parse and EXECUTE one NEXI query → (doc_ids, scores).

    Plain mode translates to the dialect and runs on the structured
    engine.  ``shrinkage=True`` (the reference's default mode) routes a
    BARE term list through :class:`~.shrinkage.ShrinkageScorer` with the
    given rule strings — matching the grammar wrapping every term in a
    ShrinkageScorerNode — and raises for restricted queries (extent-level
    shrinkage is not wired)."""
    ast = NexiParser(shrinkage=shrinkage).parse(text)
    if shrinkage:
        inner = ast.child  # LengthPrior(0) is a score no-op
        if (isinstance(inner, ExtentRestriction)
                and isinstance(inner.extent, FieldWildcard)):
            c = inner.child
            kids = c.children if isinstance(c, CombineNode) else [c]
            terms = []
            for kid in kids:
                if not (isinstance(kid, RawScorer)
                        and isinstance(kid.raw, IndexTerm)):
                    raise NexiTranslationError(
                        "shrinkage execution supports plain term lists "
                        "only (no phrases/negations)")
                terms.append((kid.raw.text, 1))
            from .shrinkage import ShrinkageScorer

            return ShrinkageScorer(
                reader, rules=shrinkage_rules).score(terms, k=k)
        raise NexiTranslationError(
            "document-level shrinkage supports bare term lists only; "
            "restricted shrinkage queries run at EXTENT granularity "
            "through run_nexi_extents(shrinkage=True)")
    from .indriql import StructuredQueryEngine

    return StructuredQueryEngine(reader).run(to_indriql(ast), k=k)


def run_nexi_extents(reader, text: str, k: int = 1000,
                     shrinkage: bool = False, shrinkage_rules: tuple = ()
                     ) -> tuple:
    """Parse and execute one NEXI query at ELEMENT granularity →
    ``(doc_ids, begins, ends, scores)`` — the INEX CO/CAS result surface
    (each target-element extent ranked separately,
    ref:include/indri/ScoredExtentResult.hpp via
    :func:`~.extents.run_extents`).

    Support-path clauses ``about(.//f, terms)`` evaluate per extent too
    (the ``#max`` over the anchored path restriction — MaxNode semantics,
    mixed clauses normalize over scoring children), as do numeric/date
    predicates (satisfying field extents contained per evaluation
    extent).  PATH targets ``//a//b[c]`` execute at element granularity
    through :func:`~.extents.run_extents_path` (NestedExtentInsideNode
    chain semantics; wildcard / alternative-list steps included); only
    clause shapes the element evaluator genuinely cannot score (e.g. a
    support path anchored under a wildcard/path context) fall back to
    document results with ``begin = end = 0`` — same ranking as
    :func:`run_nexi`, documented at ``extents.run_extents(strict=False)``.

    The two-restriction form ``//a[c1]//b[c2]`` — untranslatable to the
    document dialect (``to_indriql`` raises) — executes HERE through
    :func:`~.extents.run_nested_extents` (the ContextInclusionAnd +
    ExtentEnforcement pair) for EVERY grammar shape of either
    restriction: plain fields, alternative lists, wildcards, and (second
    restriction) paths; no document fallback exists for it, so an
    inner-clause shape the element evaluator cannot score raises
    :class:`NexiTranslationError`.

    ``shrinkage=True`` (the reference parser's default mode) executes a
    plain-field CAS target over PLAIN TERM lists through
    :meth:`~.shrinkage.ShrinkageScorer.score_extents` — each field extent
    scored by its exact structure node's shrunk estimate — closing the
    combination :func:`run_nexi` documents as document-level only."""
    from .extents import run_extents, run_extents_path, run_nested_extents

    ast = NexiParser(shrinkage=shrinkage).parse(text)
    inner = ast.child  # LengthPrior(0) is a score no-op
    if shrinkage:
        if (isinstance(inner, ExtentRestriction)
                and isinstance(inner.extent, Field)):
            c = inner.child
            kids = c.children if isinstance(c, CombineNode) else [c]
            terms = []
            for kid in kids:
                if not (isinstance(kid, RawScorer)
                        and isinstance(kid.raw, IndexTerm)):
                    raise NexiTranslationError(
                        "extent-level shrinkage supports plain term lists "
                        "only (no phrases/negations)")
                terms.append((kid.raw.text, 1))
            from .shrinkage import ShrinkageScorer

            return ShrinkageScorer(
                reader, rules=shrinkage_rules).score_extents(
                    terms, inner.extent.name, k=k)
        raise NexiTranslationError(
            "extent-level shrinkage needs a plain-field CAS target "
            "(//field[about(., terms)])")
    if isinstance(inner, ExtentEnforcement):
        ci = inner.child
        r2 = ci.enforced
        if len(ci.children) != 1:
            raise NexiTranslationError(
                "two-restriction form needs exactly one enclosed clause")
        a_spec = _restriction_spec(inner.extent)
        b_spec = _restriction_spec(r2.extent)
        try:
            # _in_restriction=True: support paths inside either clause
            # must keep their ``.//`` anchor lead so the element
            # evaluator's #max-path route recognizes them
            return run_nested_extents(
                reader, a_spec, to_indriql(ci.children[0], True),
                b_spec, to_indriql(r2.child, True), k=k)
        except ValueError as exc:
            # no document translation exists for this form — surface the
            # unsupported clause shape instead of silently degrading
            raise NexiTranslationError(
                f"two-restriction clause not executable at element "
                f"granularity: {exc}") from exc
    if (isinstance(inner, ExtentRestriction)
            and isinstance(inner.extent, NestedExtentInside)):
        # PATH target //s1//…//sn[c]: element retrieval over the
        # NestedExtentInside chain's innermost extents; clause shapes the
        # chain-context evaluator cannot score degrade to document
        # results exactly like the single-field route below
        steps = _chain_steps(inner.extent)
        try:
            return run_extents_path(
                reader, steps, to_indriql(inner.child, True), k=k)
        except ValueError as exc:
            try:
                ql = to_indriql(ast)
            except NexiTranslationError:
                raise exc
            return run_extents(reader, ql, k=k, strict=False)
    if (isinstance(inner, ExtentRestriction)
            and isinstance(inner.extent, (FieldWildcard, ExtentOr))):
        # bare term list / //*[...] target: the INEX CO surface — every
        # extent of every indexed field is a result element (the grammar's
        # ExtentRestriction(c, FieldWildcard) wrap); an alternative list
        # //(a|b)[...] is the same machinery over only those fields;
        # statistics-unsupported inner shapes fall back to document
        # results like run_extents
        from .extents import run_extents_wildcard

        flds = (tuple(f.name for f in inner.extent.fields)
                if isinstance(inner.extent, ExtentOr) else None)
        inner_ql = to_indriql(inner.child)
        try:
            return run_extents_wildcard(reader, inner_ql, k=k, fields=flds)
        except ValueError:
            # statistics-unsupported inner shape: document fallback over
            # the bare clause (the restriction drops, the module's
            # documented doc-ranking convention) — to_indriql(ast) itself
            # would raise for an ExtentOr restriction
            return run_extents(reader, inner_ql, k=k, strict=False)
    return run_extents(reader, to_indriql(ast), k=k, strict=False)
