"""Consistency-checker core (J5-J11) with hard DuckDB oracles.

The reference's flagship workload is the FullCheck consistency pass
(`FullCheck.java:71-123`); its per-rule semantics live in
`PropertyRecordCheck.java:167-230` (chain symmetry),
`PrimitiveRecordCheck.java:39-101` (first-property + ownerCheck),
`OwnerCheck.java:59-145` (orphan sweep) and `NameRecordCheck.java:42-66`
(dictionaries). Earlier rounds verified these only via pytest corruption
matrices; this module gives each rule family a DRIVER-CHECKABLE oracle
row, mirroring `FullCheckIntegrationTest.java:55-341`'s
corrupt-then-count pattern:

- ``tools/gen_checker_fixture.py`` generated a 500-node reference-shaped
  store, injected one corruption per rule family (matrix in its
  docstring), and committed the five store tables as single parquet
  files under ``fixtures/checker/``.
- Each query below runs the REAL checker plan
  (``operators/record_checks.py``) on that fixture, and its oracle
  re-expresses the *check itself* — not a hard-coded expected list — as
  DuckDB SQL over the same parquet bytes, so corruption side-effects
  (e.g. re-pointing an endpoint breaks neighbours' back-references too)
  are covered on both sides by construction.

The fixture is scale-independent on purpose: these queries ignore
``sf_dir`` (the checker's correctness is a property of the rules, not
the TPC-H volume; its *throughput* is measured by bench.py's b1 blocks
on 4M-64M-record stores).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph.model import PropertyGraph
from ..operators import record_checks as rc
from ..operators import validation
from . import register

FIXTURE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "fixtures", "checker")
)

_V_COLS = ("record_type", "rule", "entity_id", "detail")


def fixture_graph(spark: SparkSession) -> PropertyGraph:
    """Load the committed corrupted store — all six store tables
    including the NeoStore singleton chain (graph_props, r6 addition:
    corruption matrix in tools/gen_checker_fixture.py)."""
    t = {
        name: spark.read.parquet(os.path.join(FIXTURE_DIR, f"{name}.parquet"))
        for name in (
            "nodes",
            "relationships",
            "properties",
            "relationship_types",
            "property_keys",
            "graph_props",
        )
    }
    return PropertyGraph(
        nodes=t["nodes"],
        relationships=t["relationships"],
        properties=t["properties"],
        relationship_types=t["relationship_types"],
        property_keys=t["property_keys"],
        graph_props=t["graph_props"],
    )


def _ordered(v: DataFrame) -> DataFrame:
    return v.orderBy(*_V_COLS)


# --- shared oracle fragments -------------------------------------------

_FX_CTES = f"""
    nodes AS (SELECT * FROM read_parquet('{FIXTURE_DIR}/nodes.parquet')),
    rels AS (SELECT * FROM read_parquet('{FIXTURE_DIR}/relationships.parquet')),
    props AS (SELECT * FROM read_parquet('{FIXTURE_DIR}/properties.parquet')),
    rel_types AS (
      SELECT * FROM read_parquet('{FIXTURE_DIR}/relationship_types.parquet')),
    prop_keys AS (
      SELECT * FROM read_parquet('{FIXTURE_DIR}/property_keys.parquet')),
    gp_store AS (
      SELECT * FROM read_parquet('{FIXTURE_DIR}/graph_props.parquet')),
    live_gp AS (SELECT * FROM gp_store WHERE in_use),
    live_n AS (SELECT * FROM nodes WHERE in_use),
    live_r AS (SELECT * FROM rels WHERE in_use),
    live_p AS (SELECT * FROM props WHERE in_use),
    owners AS (
      SELECT 'node' AS o_kind, id AS o_id, next_prop FROM live_n
      UNION ALL
      SELECT 'rel' AS o_kind, id AS o_id, next_prop FROM live_r),
    ow AS (SELECT * FROM owners WHERE next_prop <> -1)
"""

# J1 (`NodeRecordCheck.java:39-107`): node.next_rel exists, involves this
# node, and is first in its chain (prev unset on the matching endpoint).
_NODES_BODY = """
  nj AS (
    SELECT n.id, n.next_rel, r.id AS r_id, r.src, r.dst,
           r.src_prev, r.dst_prev
    FROM live_n n LEFT JOIN live_r r ON n.next_rel = r.id
    WHERE n.next_rel <> -1)
  SELECT 'NODE' AS record_type, 'relationshipNotInUse' AS rule,
         CAST(id AS BIGINT) AS entity_id, CAST(next_rel AS VARCHAR) AS detail
  FROM nj WHERE r_id IS NULL
  UNION ALL
  SELECT 'NODE', 'relationshipForOtherNode', id, CAST(next_rel AS VARCHAR)
  FROM nj WHERE r_id IS NOT NULL AND src <> id AND dst <> id
  UNION ALL
  SELECT 'NODE', 'relationshipNotFirstInChain', id, CAST(next_rel AS VARCHAR)
  FROM nj WHERE r_id IS NOT NULL AND (src = id OR dst = id)
    AND (CASE WHEN src = id THEN src_prev ELSE dst_prev END) <> -1
"""

# J2/J3/J4 (`RelationshipRecordCheck.java:35-260`): label validity,
# endpoint liveness, and the four per-endpoint chain pointers.
_RELS_BODY = """
  rptr AS (
    SELECT id, src, dst, 'sourcePrev' AS family, src_prev AS ptr,
           src AS node, 'next' AS back_dir FROM live_r WHERE src_prev <> -1
    UNION ALL
    SELECT id, src, dst, 'sourceNext', src_next, src, 'prev'
    FROM live_r WHERE src_next <> -1
    UNION ALL
    SELECT id, src, dst, 'targetPrev', dst_prev, dst, 'next'
    FROM live_r WHERE dst_prev <> -1
    UNION ALL
    SELECT id, src, dst, 'targetNext', dst_next, dst, 'prev'
    FROM live_r WHERE dst_next <> -1),
  rpj AS (
    SELECT p.*, t.id AS t_id, t.src AS t_src, t.dst AS t_dst,
           t.src_prev AS t_src_prev, t.src_next AS t_src_next,
           t.dst_prev AS t_dst_prev, t.dst_next AS t_dst_next
    FROM rptr p LEFT JOIN live_r t ON p.ptr = t.id),
  rrule AS (
    SELECT id, ptr,
      CASE
        WHEN t_id IS NULL THEN family || 'NotInUse'
        WHEN NOT (t_src = node OR t_dst = node) THEN family || 'ForOtherNode'
        WHEN (CASE
                WHEN family LIKE 'source%' AND t_src = node THEN
                  (CASE WHEN back_dir = 'next' THEN t_src_next ELSE t_src_prev END)
                WHEN family LIKE 'source%' THEN
                  (CASE WHEN back_dir = 'next' THEN t_dst_next ELSE t_dst_prev END)
                WHEN t_dst = node THEN
                  (CASE WHEN back_dir = 'next' THEN t_dst_next ELSE t_dst_prev END)
                ELSE
                  (CASE WHEN back_dir = 'next' THEN t_src_next ELSE t_src_prev END)
              END) <> id THEN family || 'DoesNotReferenceBack'
      END AS rule
    FROM rpj)
  SELECT 'RELATIONSHIP' AS record_type, 'illegalLabel' AS rule,
         CAST(id AS BIGINT) AS entity_id, CAST(type_id AS VARCHAR) AS detail
  FROM live_r WHERE type_id < 0
  UNION ALL
  SELECT 'RELATIONSHIP', 'labelNotInUse', id, CAST(type_id AS VARCHAR)
  FROM live_r WHERE type_id >= 0
    AND type_id NOT IN (SELECT id FROM rel_types WHERE in_use)
  UNION ALL
  SELECT 'RELATIONSHIP', 'sourceNodeNotInUse', id, CAST(src AS VARCHAR)
  FROM live_r WHERE src NOT IN (SELECT id FROM live_n)
  UNION ALL
  SELECT 'RELATIONSHIP', 'targetNodeNotInUse', id, CAST(dst AS VARCHAR)
  FROM live_r WHERE dst NOT IN (SELECT id FROM live_n)
  UNION ALL
  SELECT 'RELATIONSHIP', rule, id, CAST(ptr AS VARCHAR)
  FROM rrule WHERE rule IS NOT NULL
"""

# J5 (`PrimitiveRecordCheck.java:60-101`): owner.next_prop exists, is
# first in chain, and claims this owner.
_FIRSTPROP_BODY = """
  fpj AS (
    SELECT o.o_kind, o.o_id, o.next_prop, p.id AS p_id,
           p.prev_prop AS p_prev, p.owner_id AS p_owner_id,
           p.owner_kind AS p_owner_kind
    FROM ow o LEFT JOIN live_p p ON o.next_prop = p.id)
  SELECT upper(o_kind) AS record_type, 'propertyNotInUse' AS rule,
         CAST(o_id AS BIGINT) AS entity_id,
         CAST(next_prop AS VARCHAR) AS detail
  FROM fpj WHERE p_id IS NULL
  UNION ALL
  SELECT upper(o_kind), 'propertyNotFirstInChain', o_id,
         CAST(next_prop AS VARCHAR)
  FROM fpj WHERE p_id IS NOT NULL AND p_prev <> -1
  UNION ALL
  SELECT upper(o_kind), 'propertyForOtherOwner', o_id,
         CAST(next_prop AS VARCHAR)
  FROM fpj WHERE p_id IS NOT NULL
    AND (p_owner_id <> o_id OR p_owner_kind <> o_kind)
"""

# J6/J7 + typed-value shape (`PropertyRecordCheck.java:131-230`).
_PROPS_BODY = """
  pptr AS (
    SELECT id, 'prevNotInUse' AS rule_niu,
           'previousDoesNotReferenceBack' AS rule_back,
           prev_prop AS ptr, 'next' AS back_dir
    FROM live_p WHERE prev_prop <> -1
    UNION ALL
    SELECT id, 'nextNotInUse', 'nextDoesNotReferenceBack',
           next_prop, 'prev'
    FROM live_p WHERE next_prop <> -1),
  ppj AS (
    SELECT pptr.*, t.id AS t_id, t.prev_prop AS t_prev, t.next_prop AS t_next
    FROM pptr LEFT JOIN live_p t ON pptr.ptr = t.id),
  prule AS (
    SELECT id, ptr,
      CASE WHEN t_id IS NULL THEN rule_niu
           WHEN (CASE WHEN back_dir = 'next' THEN t_next ELSE t_prev END)
                <> id THEN rule_back
      END AS rule
    FROM ppj)
  SELECT 'PROPERTY' AS record_type, rule,
         CAST(id AS BIGINT) AS entity_id, CAST(ptr AS VARCHAR) AS detail
  FROM prule WHERE rule IS NOT NULL
  UNION ALL
  SELECT 'PROPERTY', 'invalidPropertyKey', id, CAST(key_id AS VARCHAR)
  FROM live_p WHERE key_id < 0
  UNION ALL
  SELECT 'PROPERTY', 'keyNotInUse', id, CAST(key_id AS VARCHAR)
  FROM live_p WHERE key_id >= 0
    AND key_id NOT IN (SELECT id FROM prop_keys WHERE in_use)
  UNION ALL
  SELECT 'PROPERTY', 'invalidPropertyValue', id, vtype
  FROM live_p WHERE
    (vtype = 'INT' AND (value_long IS NULL OR value_string IS NOT NULL
                        OR value_array IS NOT NULL))
    OR (vtype = 'STRING' AND (value_string IS NULL OR value_long IS NOT NULL
                              OR value_array IS NOT NULL))
    OR (vtype = 'ARRAY' AND (value_array IS NULL OR value_long IS NOT NULL
                             OR value_string IS NOT NULL))
"""

# J10/J11 (`PrimitiveRecordCheck.java:39-57`, `OwnerCheck.java:81-145`).
_OWNERSHIP_BODY = """
  claims AS (SELECT next_prop, COUNT(*) AS n_owners FROM ow GROUP BY next_prop)
  SELECT 'PROPERTY' AS record_type, 'multipleOwners' AS rule,
         CAST(next_prop AS BIGINT) AS entity_id,
         CAST(n_owners AS VARCHAR) AS detail
  FROM claims WHERE n_owners > 1
  UNION ALL
  SELECT 'PROPERTY', 'orphanChain', id, CAST(owner_id AS VARCHAR)
  FROM live_p WHERE prev_prop = -1
    AND id NOT IN (SELECT next_prop FROM ow)
"""

# NeoStore singleton (`NeoStoreCheck.java:29-50`): head cardinality,
# graph ownership, prev/next symmetry, live keys, typed-value shape —
# the same rule families as the property store, scoped to graph_props.
_GRAPH_PROPS_BODY = """
  gptr AS (
    SELECT id, 'prevNotInUse' AS rule_niu,
           'previousDoesNotReferenceBack' AS rule_back,
           prev_prop AS ptr, 'next' AS back_dir
    FROM live_gp WHERE prev_prop <> -1
    UNION ALL
    SELECT id, 'nextNotInUse', 'nextDoesNotReferenceBack',
           next_prop, 'prev'
    FROM live_gp WHERE next_prop <> -1),
  gpj AS (
    SELECT gptr.*, t.id AS t_id, t.prev_prop AS t_prev, t.next_prop AS t_next
    FROM gptr LEFT JOIN live_gp t ON gptr.ptr = t.id),
  gprule AS (
    SELECT id, ptr,
      CASE WHEN t_id IS NULL THEN rule_niu
           WHEN (CASE WHEN back_dir = 'next' THEN t_next ELSE t_prev END)
                <> id THEN rule_back
      END AS rule
    FROM gpj)
  SELECT 'NEO_STORE' AS record_type, 'propertyChainHeadCount' AS rule,
         CAST(0 AS BIGINT) AS entity_id, CAST(n AS VARCHAR) AS detail
  FROM (SELECT COUNT(*) FILTER (WHERE prev_prop = -1) AS n,
               COUNT(*) AS m FROM live_gp)
  WHERE m > 0 AND n <> 1
  UNION ALL
  SELECT 'NEO_STORE', 'propertyForOtherOwner', id, CAST(owner_id AS VARCHAR)
  FROM live_gp WHERE owner_kind <> 'graph' OR owner_id <> 0
  UNION ALL
  SELECT 'NEO_STORE', rule, id, CAST(ptr AS VARCHAR)
  FROM gprule WHERE rule IS NOT NULL
  UNION ALL
  SELECT 'NEO_STORE', 'keyNotInUse', id, CAST(key_id AS VARCHAR)
  FROM live_gp
  WHERE key_id NOT IN (SELECT id FROM prop_keys WHERE in_use)
  UNION ALL
  SELECT 'NEO_STORE', 'invalidPropertyValue', id, vtype
  FROM live_gp WHERE
    (vtype = 'INT' AND (value_long IS NULL OR value_string IS NOT NULL
                        OR value_array IS NOT NULL))
    OR (vtype = 'STRING' AND (value_string IS NULL OR value_long IS NOT NULL
                              OR value_array IS NOT NULL))
    OR (vtype = 'ARRAY' AND (value_array IS NULL OR value_long IS NOT NULL
                             OR value_string IS NOT NULL))
"""

# J9 (`NameRecordCheck.java:42-66`).
_DICT_BODY = """
  dsel AS (SELECT 1)
  SELECT 'RELATIONSHIP_LABEL' AS record_type, 'emptyName' AS rule,
         CAST(id AS BIGINT) AS entity_id, CAST(name AS VARCHAR) AS detail
  FROM rel_types WHERE in_use AND (name IS NULL OR name = '')
  UNION ALL
  SELECT 'PROPERTY_KEY', 'emptyName', id, CAST(name AS VARCHAR)
  FROM prop_keys WHERE in_use AND (name IS NULL OR name = '')
"""


def _family_sql(body: str) -> str:
    return (
        f"WITH {_FX_CTES}, {body} "
        "ORDER BY record_type, rule, entity_id, detail"
    )


@register(
    "check_fixture_nodes",
    _family_sql(_NODES_BODY),
    doc="J1 node.next_rel checks on the committed corrupted fixture "
    "(`NodeRecordCheck.java:39-107`): relationshipNotInUse / "
    "ForOtherNode / NotFirstInChain — the real check_nodes plan vs a "
    "SQL re-derivation of the same rules over identical parquet bytes.",
)
def check_fixture_nodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ordered(rc.check_nodes(fixture_graph(spark)))


@register(
    "check_fixture_relationships",
    _family_sql(_RELS_BODY),
    doc="J2/J3/J4 relationship-store checks on the corrupted fixture "
    "(`RelationshipRecordCheck.java:35-260`): label validity, endpoint "
    "liveness, and the stacked four-pointer chain-symmetry join — "
    "corruption side-effects (re-pointed endpoints break neighbours' "
    "back-references) covered on both engines by re-deriving the rule.",
)
def check_fixture_relationships(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ordered(rc.check_relationships(fixture_graph(spark)))


@register(
    "check_fixture_first_property",
    _family_sql(_FIRSTPROP_BODY),
    doc="J5 primitive.next_prop checks on the corrupted fixture "
    "(`PrimitiveRecordCheck.java:60-101`): propertyNotInUse / "
    "NotFirstInChain / ForOtherOwner over the stacked node∪rel owner "
    "set — first hard oracle row for the first-property family.",
)
def check_fixture_first_property(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ordered(rc.check_primitive_first_property(fixture_graph(spark)))


@register(
    "check_fixture_properties",
    _family_sql(_PROPS_BODY),
    doc="J6/J7 property-store checks on the corrupted fixture "
    "(`PropertyRecordCheck.java:131-230`): prev/next chain symmetry "
    "(single stacked self-join), key dictionary validity, and the "
    "typed-value shape invariant.",
)
def check_fixture_properties(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ordered(rc.check_properties(fixture_graph(spark)))


@register(
    "check_fixture_ownership",
    _family_sql(_OWNERSHIP_BODY),
    doc="J10/J11 ownership checks on the corrupted fixture "
    "(`PrimitiveRecordCheck.java:39-57` ownerCheck, "
    "`OwnerCheck.java:81-145` orphan sweep): multipleOwners group count "
    "+ orphanChain anti-join, including the side-effect orphans created "
    "by the J5 re-pointing corruptions.",
)
def check_fixture_ownership(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ordered(rc.check_ownership(fixture_graph(spark)))


@register(
    "check_fixture_dictionaries",
    _family_sql(_DICT_BODY),
    doc="J9 dictionary checks on the corrupted fixture "
    "(`NameRecordCheck.java:42-66`): emptyName on both the "
    "relationship-type and property-key name stores.",
)
def check_fixture_dictionaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ordered(rc.check_dictionaries(fixture_graph(spark)))


@register(
    "check_fixture_graph_props",
    _family_sql(_GRAPH_PROPS_BODY),
    doc="NeoStore singleton checks on the corrupted fixture "
    "(`NeoStoreCheck.java:29-50`): chain head cardinality, graph "
    "ownership, prev/next symmetry, dictionary-key liveness, and the "
    "typed-value shape invariant over the 7-record graph_props chain — "
    "first hard oracle row for the one family the r5 fixture left "
    "pytest-only.",
)
def check_fixture_graph_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ordered(rc.check_graph_props(fixture_graph(spark)))


_ALL_BODIES = (
    _NODES_BODY,
    _RELS_BODY,
    _FIRSTPROP_BODY,
    _PROPS_BODY,
    _OWNERSHIP_BODY,
    _DICT_BODY,
    _GRAPH_PROPS_BODY,
)


def _summary_sql() -> str:
    unions = "\nUNION ALL\n".join(
        f"SELECT * FROM (WITH {_FX_CTES}, {b} )" for b in _ALL_BODIES
    )
    return (
        f"SELECT record_type, rule, COUNT(*) AS n_violations FROM ({unions}) "
        "GROUP BY record_type, rule ORDER BY record_type, rule"
    )


@register(
    "check_fixture_summary",
    _summary_sql(),
    doc="A1 ConsistencySummaryStatistics over the full corrupted-fixture "
    "check suite (`FullCheck.java:71-123` + "
    "`ConsistencySummaryStatistics.java`): per-(record_type, rule) "
    "violation counts across all seven store families (NeoStore "
    "included since r6) — the graph_full_validation shape, now with a "
    "hard DuckDB oracle "
    "(`FullCheckIntegrationTest.java:55-341`'s corrupt-then-count).",
)
def check_fixture_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = fixture_graph(spark)
    fams = [
        rc.check_nodes(g),
        rc.check_relationships(g),
        rc.check_primitive_first_property(g),
        rc.check_properties(g),
        rc.check_ownership(g),
        rc.check_dictionaries(g),
        rc.check_graph_props(g),
    ]
    from functools import reduce

    v = reduce(DataFrame.unionByName, fams)
    return validation.violations_summary(v).orderBy("record_type", "rule")
