"""Pattern matching: Cypher-ish fixed-length path patterns compiled to
joins.

The reference has no Cypher in-repo, but its traversal surface
(`LockableNode.java:178-201`) plus the HA test workloads are path
navigations; SURVEY §4 notes a pattern DSL compiles to joins with no
custom Catalyst work. ``match_path`` is that compiler: a list of
(rel_type, direction) steps becomes a chain of equi-joins, one join per
hop, each keyed on the node id — co-partitioned on a bucketed layout.
"""

from __future__ import annotations

import re
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# "(var[:kind] [{key: val, ...}])" node; "-[:TYPE]->" / "<-[:TYPE]-"
# edge, with optional "*lo..hi" variable-length quantifier and optional
# type: "-[*1..2]->"
_NODE_RE = re.compile(r"\(\s*(\w+)?\s*(?::\s*(\w+))?\s*(?:\{([^}]*)\})?\s*\)")
_EDGE_RE = re.compile(
    r"(<?)-\[\s*(?::\s*(\w+))?\s*(?:\*\s*(\d+)\s*\.\.\s*(\d+))?\s*\]-(>?)"
)
_PROP_RE = re.compile(r"(\w+)\s*:\s*('[^']*'|\"[^\"]*\"|[\w.+-]+)")


def _parse_props(body: str | None) -> dict[str, object]:
    """Parse a Cypher inline property map body into literal values."""
    if not body or not body.strip():
        return {}
    props: dict[str, object] = {}
    matched = _PROP_RE.findall(body)
    if not matched:
        raise ValueError(f"bad property map: {{{body}}}")
    for key, raw in matched:
        if raw[0] in "'\"":
            props[key] = raw[1:-1]
        elif raw in ("true", "false"):
            props[key] = raw == "true"
        else:
            props[key] = float(raw) if "." in raw else int(raw)
    return props


def match_path(
    nodes: DataFrame,
    rels: DataFrame,
    steps: Sequence[tuple[str, str]],
    start_filter=None,
) -> DataFrame:
    """Match a fixed-length path pattern.

    ``steps``: [(type_name, 'out'|'in'), ...] for single hops, or
    (type_name | None, direction, lo, hi) for a variable-length segment
    (type None = any type). Returns one row per bound path with columns
    n0, n1, ... nK (node ids along the path).
    ``start_filter``: optional Column predicate on the start node.

    Variable-length semantics: a segment binds the DISTINCT endpoint
    pairs connected by some walk of lo..hi hops — intermediate nodes are
    not bound (as in Cypher) and multiple walks between the same pair
    collapse to one row (reachability semantics; per-level DISTINCT
    keeps the frontier bounded on cyclic graphs, the same contract as
    ``traversal.bfs_reachable``).

    Example — (customer)-[:PLACED]->(o)-[:CONTAINS]->(p):
        match_path(nodes, rels, [("PLACED", "out"), ("CONTAINS", "out")])
    """
    start = nodes.select(F.col("id").alias("n0"))
    if start_filter is not None:
        start = nodes.filter(start_filter).select(F.col("id").alias("n0"))
    out = start
    for i, step in enumerate(steps):
        type_name, direction = step[0], step[1]
        lo, hi = (step[2], step[3]) if len(step) > 2 else (1, 1)
        e = rels if type_name is None else rels.filter(F.col("type_name") == type_name)
        if direction == "out":
            edge = e.select(F.col("src").alias("__a"), F.col("dst").alias("__b"))
        else:
            edge = e.select(F.col("dst").alias("__a"), F.col("src").alias("__b"))
        if (lo, hi) == (1, 1):
            seg = edge
        else:
            if not 1 <= lo <= hi:
                raise ValueError(f"bad quantifier *{lo}..{hi}")
            level = edge.distinct()
            acc = level if lo <= 1 else None
            for k in range(2, hi + 1):
                hop = edge.select(
                    F.col("__a").alias("__b"), F.col("__b").alias("__c")
                )
                level = (
                    level.join(hop, "__b")
                    .select("__a", F.col("__c").alias("__b"))
                    .distinct()
                )
                if k >= lo:
                    acc = level if acc is None else acc.unionByName(level)
            seg = acc.distinct()
        out = out.join(
            seg.select(F.col("__a").alias(f"n{i}"), F.col("__b").alias(f"n{i + 1}")),
            f"n{i}",
        )
    return out


def cypher_match(
    nodes: DataFrame,
    rels: DataFrame,
    pattern: str,
    attach: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Cypher-ish MATCH for fixed-length patterns, compiled to joins.

    Supported grammar (a deliberate subset — enough for the reference's
    navigation workloads; SURVEY §4: a pattern DSL compiles to joins
    with no custom Catalyst rules)::

        (a:customer)-[:PLACED]->(o)-[:CONTAINS]->(p:part)
        (n:nation)<-[:IN_NATION]-(c)
        (c:customer)-[*1..2]->(x)          # variable length, any type
        (s)-[:SUPP_NATION*1..1]->(n)       # variable length, typed
        (r:region {name: 'ASIA'})<-[:IN_REGION]-(n)   # property map

    Each ``(var[:kind])`` binds a column ``var`` = node id in the output;
    ``:kind`` adds an equality filter against ``nodes.kind``, and an
    inline ``{key: literal, ...}`` map filters on the matching node
    columns (string/number/bool literals, Cypher property-map
    semantics). Direction follows the arrow. Returns one row per bound
    path; variable-length segments bind distinct endpoint pairs (see
    ``match_path``).

    ``attach`` is the RETURN-projection analog: ``{"var": ["name", ...]}``
    joins the listed node columns back onto the path as ``var_name``
    etc. — one id-keyed join per attached var (co-partitioned on a
    bucketed node layout).
    """
    pos = 0
    m = _NODE_RE.match(pattern, pos)
    if not m:
        raise ValueError(f"pattern must start with a node: {pattern!r}")
    vars_: list[tuple[str, str | None, dict[str, object]]] = [
        (m.group(1) or "n0", m.group(2), _parse_props(m.group(3)))
    ]
    steps: list[tuple[str, str]] = []
    pos = m.end()
    while pos < len(pattern):
        em = _EDGE_RE.match(pattern, pos)
        if not em:
            if pattern[pos:].strip() == "":
                break
            raise ValueError(f"expected edge at: {pattern[pos:]!r}")
        left, type_name, lo, hi, right = em.groups()
        if left == "<" and right != ">":
            direction = "in"
        elif right == ">" and left != "<":
            direction = "out"
        else:
            raise ValueError(f"edge needs exactly one arrow: {em.group(0)!r}")
        if type_name is None and lo is None:
            raise ValueError(f"edge needs a type or a quantifier: {em.group(0)!r}")
        pos = em.end()
        nm = _NODE_RE.match(pattern, pos)
        if not nm:
            raise ValueError(f"expected node at: {pattern[pos:]!r}")
        vars_.append((nm.group(1) or f"n{len(vars_)}", nm.group(2), _parse_props(nm.group(3))))
        if lo is None:
            steps.append((type_name, direction))
        else:
            steps.append((type_name, direction, int(lo), int(hi)))
        pos = nm.end()

    out = match_path(nodes, rels, steps)
    for i, (var, _, _) in enumerate(vars_):
        out = out.withColumnRenamed(f"n{i}", var)
    for var, kind, props in vars_:
        if kind is None and not props:
            continue
        cond = F.lit(True)
        if kind is not None:
            cond = cond & (F.col("kind") == kind)
        for key, val in props.items():
            if key not in nodes.columns:
                raise ValueError(f"unknown node property {key!r} in {{...}} for ({var})")
            cond = cond & (F.col(key) == F.lit(val))
        bound = nodes.filter(cond).select(F.col("id").alias(var))
        if props:
            # literal-valued property maps are selective → broadcast the
            # bound set; kind-only filters can be huge, leave those to
            # Catalyst/AQE join selection
            bound = F.broadcast(bound)
        out = out.join(bound, var, "left_semi")
    known = {var for var, _, _ in vars_}
    for var, cols in (attach or {}).items():
        if var not in known:
            raise ValueError(f"attach: {var!r} is not bound by the pattern")
        missing = [c for c in cols if c not in nodes.columns]
        if missing:
            raise ValueError(f"attach: unknown node columns {missing}")
        proj = nodes.select(
            F.col("id").alias(var), *[F.col(c).alias(f"{var}_{c}") for c in cols]
        )
        out = out.join(proj, var)
    return out
