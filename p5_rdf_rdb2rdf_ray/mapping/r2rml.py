"""R2RML front-end: Turtle mapping document → MappingSpec.

Mirrors [R: R2RML.pm :: new — parse Turtle, walk rr:TriplesMap nodes,
compile to the Simple structure]; semantics per W3C-R2RML §§5–9.

Supported vocabulary: rr:logicalTable (rr:tableName | rr:sqlQuery),
rr:subjectMap / rr:subject, rr:template / rr:column / rr:constant,
rr:class, rr:termType (rr:IRI / rr:BlankNode / rr:Literal), rr:language,
rr:datatype, rr:graphMap / rr:graph / rr:defaultGraph,
rr:predicateObjectMap with rr:predicateMap / rr:predicate and
rr:objectMap / rr:object, rr:parentTriplesMap + rr:joinCondition
(rr:child / rr:parent), rr:inverseExpression (compiled into the term map;
consumed by ``engine.r2rml_lookup`` for point-lookup pushdown, W3C §7.7).
Unsupported (not used by the reference's tests): rr:sqlVersion
(accepted, ignored).
"""

from __future__ import annotations

from .spec import (
    BNODE,
    IRI,
    LITERAL,
    MappingSpec,
    PredObjSpec,
    RefObjectSpec,
    TermMapSpec,
    TriplesMapSpec,
)
from .turtle import Graph, Term, parse_turtle

RR = "http://www.w3.org/ns/r2rml#"


def _r(name: str) -> str:
    return RR + name


def _lit(t: Term | None) -> str | None:
    if t is None:
        return None
    if t[0] != "lit":
        raise ValueError(f"r2rml: expected literal, got {t}")
    return t[1]


def _name_of(term: Term) -> str:
    return term[1] if term[0] == "iri" else "_:" + term[1]


class R2RMLError(ValueError):
    pass


def _iri_of(term: Term, what: str) -> str:
    """§7.4.1 shortcut guard: rr:subject / rr:predicate / rr:graph
    shortcuts denote constant IRIs — a literal there is invalid RDF."""
    if term[0] != "iri":
        raise R2RMLError(f"{what} must be an IRI (W3C-R2RML §7.4.1)")
    return term[1]


def _term_map(
    g: Graph,
    node: Term,
    position: str,
    base: str,
) -> TermMapSpec:
    """Compile one term map node (W3C-R2RML §7.4 incl. positional term-type
    defaults: subject/predicate/graph → IRI; object → Literal iff
    rr:column / rr:language / rr:datatype present, else IRI)."""
    template = _lit(g.obj(node, _r("template")))
    column = _lit(g.obj(node, _r("column")))
    constant = g.obj(node, _r("constant"))
    lang = _lit(g.obj(node, _r("language")))
    dt_term = g.obj(node, _r("datatype"))
    datatype = dt_term[1] if dt_term is not None else None
    tt = g.obj(node, _r("termType"))

    kind = IRI
    if tt is not None:
        kind = {
            _r("IRI"): IRI,
            _r("BlankNode"): BNODE,
            _r("Literal"): LITERAL,
        }[tt[1]]
        # W3C-R2RML §7.4.1 term-type constraints: a subject map must be
        # rr:IRI or rr:BlankNode; predicate and graph maps must be
        # rr:IRI. [R: R2RML.pm enforces the same; a literal subject is
        # not RDF]
        if position == "subject" and kind == LITERAL:
            raise R2RMLError(
                "rr:termType rr:Literal is not allowed on a subject map "
                "(W3C-R2RML §7.4.1)"
            )
        if position in ("predicate", "graph") and kind != IRI:
            raise R2RMLError(
                f"rr:termType on a {position} map must be rr:IRI "
                "(W3C-R2RML §7.4.1)"
            )
    elif position == "object":
        if column is not None or lang is not None or datatype is not None:
            kind = LITERAL
        elif constant is not None and constant[0] == "lit":
            kind = LITERAL
        else:
            kind = IRI

    const_val: str | None = None
    if constant is not None:
        # W3C-R2RML §7.4.1: constants on subject/predicate/graph maps
        # must be IRIs — a literal (or bnode) constant there would emit
        # invalid RDF, so reject at compile like the termType checks
        if position != "object" and constant[0] != "iri":
            raise R2RMLError(
                f"rr:constant on a {position} map must be an IRI "
                "(W3C-R2RML §7.4.1)"
            )
        if constant[0] == "iri":
            const_val = constant[1]
        elif constant[0] == "lit":
            const_val = constant[1]
            if kind == IRI and position == "object":
                kind = LITERAL
            if len(constant) > 2:
                lang = lang or constant[2]
                datatype = datatype or constant[3]
                if datatype == "http://www.w3.org/2001/XMLSchema#string":
                    datatype = None
        else:
            const_val = constant[1]
            kind = BNODE

    if template is not None and base and kind == IRI:
        # resolve relative template head against base (W3C-R2RML §7.4)
        if not _is_absolute(template):
            template = base + template
    if const_val is not None and kind == IRI and not _is_absolute(const_val):
        const_val = base + const_val

    return TermMapSpec(
        kind=kind,
        template=template,
        column=column,
        constant=const_val,
        lang=lang,
        datatype=datatype,
        inverse_expression=_lit(g.obj(node, _r("inverseExpression"))),
    )


def _is_absolute(s: str) -> bool:
    import re

    return bool(re.match(r"^[A-Za-z][A-Za-z0-9+.\-]*:", s))


def _graph_maps(g: Graph, node: Term, base: str) -> tuple:
    """ALL rr:graphMap / rr:graph maps on a subject or predicate-object
    map (W3C-R2RML §11.1 allows several; target graphs are a union).
    rr:defaultGraph compiles to a ``None`` member (explicit default)."""
    out: list = []
    for gm in g.objects(node, _r("graphMap")):
        tm = _term_map(g, gm, "graph", base)
        out.append(None if tm.constant == _r("defaultGraph") else tm)
    for gshort in g.objects(node, _r("graph")):
        if gshort == ("iri", _r("defaultGraph")):
            out.append(None)
        else:
            out.append(TermMapSpec(kind=IRI, constant=_iri_of(gshort, "rr:graph")))
    return tuple(out)


def compile_r2rml(turtle_text: str, base: str = "http://example.com/base/") -> MappingSpec:
    g, prefixes = parse_turtle(turtle_text, base="")
    maps: dict[str, TriplesMapSpec] = {}

    tm_nodes = g.subjects_with(_r("logicalTable"))
    for node in g.subjects_of_type(_r("TriplesMap")):
        if node not in tm_nodes:
            tm_nodes.append(node)

    for node in tm_nodes:
        name = _name_of(node)
        lt = g.obj(node, _r("logicalTable"))
        if lt is None:
            raise R2RMLError(f"triples map {name} has no rr:logicalTable")
        table = _lit(g.obj(lt, _r("tableName")))
        sql = _lit(g.obj(lt, _r("sqlQuery")))
        if table is None and sql is None:
            raise R2RMLError(f"{name}: logicalTable needs tableName or sqlQuery")
        if table is None:
            table = f"__sql_{len(maps)}"
        table = table.strip('"')

        sm = g.obj(node, _r("subjectMap"))
        if sm is not None:
            subject = _term_map(g, sm, "subject", base)
            classes = tuple(_name_of(c) for c in g.objects(sm, _r("class")))
            graphs = _graph_maps(g, sm, base)
        else:
            s_short = g.obj(node, _r("subject"))
            if s_short is None:
                raise R2RMLError(f"{name}: no subjectMap/subject")
            subject = TermMapSpec(kind=IRI, constant=_iri_of(s_short, "rr:subject"))
            classes = ()
            graphs = ()

        pos: list[PredObjSpec] = []
        refs: list[RefObjectSpec] = []
        for pom in g.objects(node, _r("predicateObjectMap")):
            preds: list[TermMapSpec] = []
            for pm in g.objects(pom, _r("predicateMap")):
                preds.append(_term_map(g, pm, "predicate", base))
            for p_short in g.objects(pom, _r("predicate")):
                preds.append(TermMapSpec(kind=IRI, constant=_iri_of(p_short, "rr:predicate")))
            pom_graphs = _graph_maps(g, pom, base)

            objs: list[TermMapSpec] = []
            ref_parents: list[tuple[str, tuple[tuple[str, str], ...]]] = []
            for om in g.objects(pom, _r("objectMap")):
                parent = g.obj(om, _r("parentTriplesMap"))
                if parent is not None:
                    join: list[tuple[str, str]] = []
                    for jc in g.objects(om, _r("joinCondition")):
                        child = _lit(g.obj(jc, _r("child")))
                        par = _lit(g.obj(jc, _r("parent")))
                        join.append((child, par))
                    ref_parents.append((_name_of(parent), tuple(join)))
                else:
                    objs.append(_term_map(g, om, "object", base))
            for o_short in g.objects(pom, _r("object")):
                if o_short[0] == "lit":
                    objs.append(
                        TermMapSpec(
                            kind=LITERAL,
                            constant=o_short[1],
                            lang=o_short[2],
                            datatype=None
                            if o_short[3]
                            in (None, "http://www.w3.org/2001/XMLSchema#string")
                            else o_short[3],
                        )
                    )
                else:
                    objs.append(TermMapSpec(kind=IRI, constant=_name_of(o_short)))

            for pred in preds:
                for obj in objs:
                    pos.append(PredObjSpec(pred=pred, obj=obj, graphs=pom_graphs))
                for parent_name, join in ref_parents:
                    refs.append(
                        RefObjectSpec(
                            pred=pred, parent=parent_name, join=join,
                            graphs=pom_graphs
                        )
                    )

        maps[name] = TriplesMapSpec(
            name=name,
            table=table,
            sql=sql,
            subject=subject,
            classes=classes,
            graphs=graphs,
            pos=tuple(pos),
            refs=tuple(refs),
        )
    return MappingSpec(maps=maps, base=base, namespaces=dict(prefixes))
