"""Query reformulation — the `reformulate` aux app (ref:reformulate/
ReformulateQuery.cpp:15-58, src/ReformulateQuery.cpp:16-362).

The reference reads raw (natural-language) query text and rewrites it into
an IndriQL query for the retrieval engine: downcase -> stop-structure
removal (Huston) -> lite stopping (Bendersky) -> one of SDM / FDM /
CMU-FDM / plain #combine generation.  Everything here is a pure string
transform, reproduced byte-for-byte (spacing and trailing-space quirks
included) so the generated queries are the reference's exactly; the
generated strings execute on :class:`~.indriql.StructuredQueryEngine`
unmodified.

Reference quirks preserved deliberately:

- ``StopStructureRemover`` (ref:src/StopStructureRemover.cpp:14-274)
  strips the FIRST matching prefix in ARRAY order (not the longest), and
  only at position 0.
- ``QueryStopper`` (ref:src/QueryStopper.cpp:18-49) declares
  ``NUM_STOP_WORDS 57`` but initialises only 39 strings; the remaining 18
  array slots are default-constructed EMPTY strings, so empty tokens
  (from doubled spaces) are stopped too.  The kept tokens are re-joined
  with a trailing space.
- ``transform`` (ref:src/ReformulateQuery.cpp:321-362) returns the
  literal string ``"EMPTYQUERY"`` when stopping consumed everything.
- ``makeIndriFriendly`` (ref:src/ReformulateQuery.cpp:74-102) scans its
  forbidden-character list up to a sentinel ``'e'`` — the punctuation
  before the sentinel is replaced by spaces, and ``'e'`` itself (being
  the terminator) never is.  NOTE: the reference's ``transform()``
  (ref:src/ReformulateQuery.cpp:321-360) never calls it — it is a public
  method left to callers — so :func:`reformulate` matching that (NOT
  pre-normalizing punctuation, apostrophed stop structures unmatched)
  is exact parity, not an omission; :func:`make_indri_friendly` is
  exported for callers who want the pre-pass.

For reformulating query LOGS at scale (millions of raw queries), use
:func:`reformulate_batch` inside ``Dataset.map_batches`` — the transform
is per-row pure, embarrassingly parallel, and needs no index state.
"""
from __future__ import annotations

from typing import Sequence

# ref:src/StopStructureRemover.cpp:16-260 — exact strings, exact order
# (first match in this order wins; every entry carries its trailing space).
STOP_STRUCTURES: tuple[str, ...] = (
    "you ever had ",
    "why do i ",
    "why do we ",
    "why is there ",
    "why will not ",
    "why will ",
    "why does ",
    "why can ",
    "why are ",
    "why did ",
    "why should ",
    "why is ",
    "why do people think ",
    "why do ",
    "why ",
    "with what is ",
    "where can i find stuff about ",
    "where can i ",
    "where can we ",
    "where can ",
    "where are ",
    "when was ",
    "when is ",
    "when did ",
    "when are ",
    "when ",
    "what are some experiences people ",
    "what are some people s experiences ",
    "what are some people s opinions ",
    "what are some people s opinions about ",
    "what are people s opinions on ",
    "what are people s opinions ",
    "what are people s opinions about ",
    "what are people s saying about ",
    "what are people saying about ",
    "what are the people saying about ",
    "what are people saying ",
    "what will happen ",
    "what would happen if ",
    "what causes ",
    "what can be done about ",
    "what can be done ",
    "what happens ",
    "what makes ",
    "what do people say about ",
    "what do people say ",
    "what do people think about ",
    "what do people think ",
    "what do ",
    "what is the ",
    "what is ",
    "what are the effects ",
    "what are the ",
    "what are ",
    "was the ",
    "true or false a ",
    "theres a ",
    "the ",
    "tell me which is ",
    "tell me stuff about ",
    "still hoping to find a ",
    "some info about ",
    "should we be ",
    "should ",
    "recommend ",
    "please name 5 ",
    "please name ",
    "please explain in detail about ",
    "please compare ",
    "need to find a ",
    "name of the five ",
    "names of ",
    "name the ",
    "name a ",
    "my wife wants to know ",
    "my wife has ",
    "my mother has ",
    "my mom has ",
    "my husband wants to get a ",
    "my girlfriend is fed up of my ",
    "my boyfriend has ",
    "my best friend came down with ",
    "looking for info on an ",
    "looking for a ",
    "list ",
    "know any good ",
    "ive heard that ",
    "is the ",
    "information on how to ",
    "information about the ",
    "information about ",
    "in your opinion what would be the ",
    "in which ",
    "in what ",
    "in the ",
    "in simple terms could some please tell me what ",
    "im looking for an ",
    "im looking for a ",
    "im looking for ",
    "im also interested to ",
    "im 21 and am having ",
    "im ",
    "if you have ",
    "if the ",
    "if some is ",
    "if it is true that ",
    "if i am having a ",
    "i would like to know the ",
    "i would like information about ",
    "i was just told i have a ",
    "i want to understand the ",
    "i want to try ",
    "i want to know what your ",
    "i want to know the meaning of ",
    "i want to know something about ",
    "i want to know if there is any ",
    "i want to know everything about ",
    "i want to know a little about ",
    "i want to be ",
    "i want details of ",
    "i want ",
    "i read that ",
    "i need to know the ",
    "i need to find information on ",
    "i need to find an ",
    "i need to devise a ",
    "i need to ",
    "i need the correct spelling of ",
    "i need some technical information about how a ",
    "i need information on ",
    "i need as many ",
    "i need a list of ",
    "i need a ",
    "i heard that ",
    "i have taken ",
    "i have just been told my aunt has a ",
    "i cant seem to ",
    "i am trying to find an ",
    "how can we have ",
    "how can we ",
    "how much of ",
    "how did ",
    "how much ",
    "how would ",
    "how does one ",
    "how does ",
    "how do people think ",
    "how do i ",
    "how are the ",
    "how are ",
    "how is ",
    "how ",
    "hi im trying to find some ",
    "help me with my ",
    "help im freaked out i might have ",
    "give me information on a ",
    "give me information on ",
    "give me a ",
    "give me ",
    "give a brief explanation ",
    "give 5 examples of ",
    "give ",
    "for a year ive been getting some ",
    "finish the sentence ",
    "find comments about ",
    "find the ",
    "find me ",
    "find a ",
    "discuss the ",
    "describe ",
    "define ",
    "could you please tell me ",
    "could you briefly explain about ",
    "could someone explain the ",
    "could a ",
    "could ",
    "compare the ",
    "compare ",
    "can you think of a ",
    "can you tell me about the ",
    "can you point me the ",
    "can you please give me an example of a ",
    "can you please give ",
    "can you please ",
    "can you name 1 ",
    "can you list ",
    "can you be ",
    "can we ",
    "can u watch ",
    "can u find for me the website about ",
    "can the ",
    "can someone tell me how can i ",
    "can someone please explain about ",
    "can someone please describe what ",
    "can someone help me with my ",
    "can i use ",
    "can i know ",
    "can i have ",
    "can i get ",
    "can i ",
    "can anyone tell me what is ",
    "can anyone tell me what ",
    "can anyone tell me more about ",
    "can anyone suggest a good ",
    "can anyone say what is ",
    "can anyone help with ",
    "can anyone give me info on ",
    "can any one help me out with a ",
    "can any body suggest me ",
    "can a ",
    "can ",
    "at what ",
    "are there ",
    "anywhere to get a ",
    "anyone want to ",
    "anyone out there have ",
    "anyone know where i can ",
    "anyone know what to use for ",
    "anyone know of a ",
    "anyone know ",
    "anyone here know what the ",
    "anyone heard any news of ",
    "anyone have any ",
    "anyone have a ",
    "anyone have ",
    "anyone had a ",
    "anyone familiar with the ",
    "anyone ever heard of the ",
    "anyone ever ",
    "anybody know of ",
    "any tips for ",
    "any opinions on ",
    "any advice on how to heal a ",
    "do ",
    "does ",
    "what ",
    "did ",
    "who is ",
    "who ",
    "is ",
    "has ",
    "were ",
    "will ",
    "should ",
    "which ",
    "have ",
)

# ref:src/QueryStopper.cpp:21-33 — the 39 initialised strings; "" stands in
# for the 18 default-constructed slots of the declared-57 array.
QUERY_STOPWORDS: frozenset[str] = frozenset({
    "a", "about", "am", "an", "and", "are", "as", "at", "be", "been",
    "being", "by", "did", "do", "does", "doing", "done", "for", "from",
    "had", "have", "has", "he", "in", "if", "is", "it", "its", "of", "on",
    "or", "that", "th", "the", "to", "was", "were", "will", "with", "",
})

_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz")

# ref:src/ReformulateQuery.cpp:75 — everything before the 'e' sentinel
_FORBIDDEN = "`~!@#$%^&*()-_=+[]{}\\|;:'\",.<>/?"
_FRIENDLY = str.maketrans({c: " " for c in _FORBIDDEN})


def downcase(text: str) -> str:
    """Per-char ASCII tolower (ref:src/ReformulateQuery.cpp:16-23) —
    non-ASCII bytes pass through untouched, unlike ``str.lower``."""
    return text.translate(_ASCII_LOWER)


def remove_stop_structures(query: str) -> str:
    """Strip the first STOP_STRUCTURES prefix in array order
    (ref:src/StopStructureRemover.cpp:263-274)."""
    for s in STOP_STRUCTURES:
        if query.startswith(s):
            return query[len(s):]
    return query


def lite_stop(query: str) -> str:
    """Drop stopword / empty tokens; rejoin with a trailing space
    (ref:src/QueryStopper.cpp:34-48)."""
    out = []
    for token in query.split(" "):
        if token not in QUERY_STOPWORDS:
            out.append(token)
    return "".join(t + " " for t in out)


def make_indri_friendly(query: str) -> str:
    """Replace forbidden punctuation with spaces
    (ref:src/ReformulateQuery.cpp:74-102)."""
    return query.translate(_FRIENDLY)


def generate_combine_query(terms: Sequence[str]) -> str:
    """ref:src/ReformulateQuery.cpp:309-316"""
    return "#combine( " + "".join(t + " " for t in terms) + ")"


def _wsum(fields: Sequence[tuple[str, str]], expr: str) -> str:
    return ("#wsum( "
            + "".join(f"{w} {expr}.({f}) " for f, w in fields))


def generate_sdm_query(terms: Sequence[str],
                       fields: Sequence[tuple[str, str]] = (),
                       wT: str = "0.85", wO: str = "0.1",
                       wU: str = "0.05") -> str:
    """Sequential Dependence Model rewrite
    (ref:src/ReformulateQuery.cpp:103-164; fielded variant :103-138,
    flat :144-164).  ``fields`` is ``[(name, weight_string), ...]``."""
    if len(terms) == 1:
        return "#combine(" + terms[0] + ")"
    if fields:
        queryT = "".join(_wsum(fields, t) + " )\n " for t in terms)
        queryO = ""
        queryU = ""
        for a, b in zip(terms, terms[1:]):
            ow = f"#1({a} {b})"
            uw = f"#uw8({a} {b})"
            queryO += _wsum(fields, ow) + " )\n"
            queryU += _wsum(fields, uw) + " )\n"
        return (f"#weight( {wT} #combine({queryT}) {wO} #combine({queryO}"
                f") {wU} #combine({queryU}))")
    t = " ".join(terms)
    ow = "".join(f"#1({a} {b}) " for a, b in zip(terms, terms[1:]))
    uw = "".join(f"#uw8({a} {b}) " for a, b in zip(terms, terms[1:]))
    return (f"#weight( {wT} #combine({t}) {wO} #combine({ow}"
            f") {wU} #combine({uw}))")


def generate_fdm_query(terms: Sequence[str],
                       fields: Sequence[tuple[str, str]] = (),
                       wT: str = "0.85", wO: str = "0.1",
                       wU: str = "0.05") -> str:
    """Full Dependence Model rewrite (every contiguous sub-span, window =
    4x span length; ref:src/ReformulateQuery.cpp:221-306)."""
    if len(terms) == 1:
        return "#combine(" + terms[0] + ")"
    if fields:
        queryT = "".join(_wsum(fields, t) + " )\n " for t in terms)
        queryO = ""
        queryU = ""
        for start in range(len(terms) - 1):
            for end in range(start + 1, len(terms)):
                span = "".join(t + " " for t in terms[start:end + 1])
                win = 4 * (end - start + 1)
                queryO += _wsum(fields, f"#1({span})") + " )\n"
                queryU += _wsum(fields, f"#uw{win}({span})") + " )\n"
        return (f"#weight( {wT} #combine({queryT}) {wO} #combine({queryO}"
                f") {wU} #combine({queryU}))")
    queryT = "".join(t + " " for t in terms)
    queryO = ""
    queryU = ""
    for start in range(len(terms) - 1):
        for end in range(start + 1, len(terms)):
            span = "".join(t + " " for t in terms[start:end + 1])
            win = 4 * (end - start + 1)
            queryO += f"#1({span})\n"
            queryU += f"#uw{win}({span})\n"
    return (f"#weight( {wT} #combine({queryT}) {wO} #combine({queryO}"
            f") {wU} #combine({queryU}))")


_CMU_FIELDS = ("url", "title", "body", "meta", "alt", "inlink")


def generate_cmufdm_query(terms: Sequence[str],
                          params: dict | None = None) -> str:
    """CMU web-style mixture + FDM rewrite
    (ref:src/ReformulateQuery.cpp:170-218)."""
    p = params or {}
    w_mixture = str(p.get("weightMixture", "1.0"))
    w_dependency = str(p.get("weightDependency", "1.0"))
    fw = {f: str(p.get("weight" + f.capitalize()
                       if f != "url" else "weightURL", "1.0"))
          for f in _CMU_FIELDS}
    mixture = " #combine ( "
    for t in terms:
        mixture += ("#wsum ("
                    + f"{fw['url']} {t}.(url) "
                    + f"{fw['title']} {t}.(title) "
                    + f"{fw['body']} {t}.(body) "
                    + f"{fw['meta']} {t}.(meta) "
                    + f"{fw['alt']} {t}.(alt) "
                    + f"{fw['inlink']} {t}.(inlink)" + ") ")
    mixture += " ) "
    if len(terms) < 2:
        q = terms[0]
        wT = str(p.get("weightT", "0.85"))
        wO = str(p.get("weightO", "0.1"))
        wU = str(p.get("weightU", "0.05"))
        # the reference's pathological single-term branch, double space
        # and #uw4 included (ref:src/ReformulateQuery.cpp:202-211)
        fdm = (f" #weight  ( {wT} {q} {wO} #1({q}) {wU} #uw4({q}) ) ")
    else:
        fdm = generate_fdm_query(
            terms,
            wT=str(p.get("weightT", "0.85")),
            wO=str(p.get("weightO", "0.1")),
            wU=str(p.get("weightU", "0.05")))
    return f"#weight( {w_mixture}{mixture}{w_dependency} {fdm} )"


def reformulate(query_text: str, params: dict | None = None) -> str:
    """The full transform (ref:src/ReformulateQuery.cpp:321-362):
    downcase -> optional stop-structure removal -> optional lite stopping
    -> SDM / FDM / CMU-FDM / #combine generation.  ``params`` mirrors the
    reference's Parameters keys (stopStructures, liteStop, genSDM, genFDM,
    genCMUFDM, weightT/O/U, queryField=[(name, weight), ...])."""
    p = params or {}
    reform = downcase(query_text)
    if p.get("stopStructures", True):
        reform = remove_stop_structures(reform)
    if p.get("liteStop", True):
        reform = lite_stop(reform)
    if len(reform) == 0:
        return "EMPTYQUERY"
    terms = [t for t in reform.split(" ") if t]
    fields = [(str(n), str(w)) for n, w in p.get("queryField", [])]
    kw = {k: str(p[k]) for k in ("weightT", "weightO", "weightU") if k in p}
    kw = {"wT": kw.get("weightT", "0.85"), "wO": kw.get("weightO", "0.1"),
          "wU": kw.get("weightU", "0.05")}
    if p.get("genSDM", False):
        return generate_sdm_query(terms, fields, **kw)
    if p.get("genFDM", False):
        return generate_fdm_query(terms, fields, **kw)
    if p.get("genCMUFDM", False):
        return generate_cmufdm_query(terms, p)
    return generate_combine_query(terms)


def reformulate_batch(batch, params: dict | None = None):
    """``map_batches`` stage for bulk query-log reformulation: pyarrow
    batch with a ``text`` column -> adds ``reformulated``.  Pure per-row
    string work — no index state, safe at any parallelism."""
    import pyarrow as pa

    texts = batch.column("text").to_pylist()
    out = [reformulate(t, params) for t in texts]
    return batch.append_column("reformulated", pa.array(out, pa.string()))


def queries_to_param_xml(numbered: Sequence[tuple[str, str]],
                         params: dict | None = None) -> str:
    """The reformulate app's output file (ref:reformulate/
    ReformulateQuery.cpp:26-48): a <parameters> block of rewritten
    queries."""
    lines = ["<parameters>"]
    for number, text in numbered:
        lines.append(f"<query><number>{number}</number>\n<text>"
                     f"{reformulate(text, params)}</text>\n</query>")
    lines.append("</parameters>")
    return "\n".join(lines) + "\n"
