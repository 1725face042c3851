"""One-shot generator for the committed consistency-checker fixture.

Builds the reference-shaped 500-node PropertyGraph
(`DataGenerator.java:55-101` shape via graph.generator.generate_graph),
injects one corruption per checker rule family — the
`FullCheckIntegrationTest.java:55-341` corrupt-then-count pattern — and
writes each store as a SINGLE parquet file under fixtures/checker/ so
that (a) the Spark plans and (b) the DuckDB oracle SQL in
plans/checker.py read the exact same bytes. Run once; the output is
committed, so regeneration determinism is irrelevant to correctness.

Corruption matrix (ids are stable under the generator's layout:
node n ⇒ rels 3n..3n+2 / props 4n..4n+3; see generator.py:76-170):

  J1  node 10.next_rel → 999999          relationshipNotInUse
      node 11.next_rel → 36 (src=12)     relationshipForOtherNode
      node 12.next_rel → 37 (2nd in 12's chain)
                                         relationshipNotFirstInChain
  J2  rel 60.type_id → -1                illegalLabel
      rel 61.type_id → 9                 labelNotInUse
  J4  rel 62.src → 888888                sourceNodeNotInUse (+ chain
                                         side-effects on rels whose
                                         pointers reach 62 — the oracle
                                         mirrors the CHECK, so these are
                                         covered, not special-cased)
  J3  rel 63.src_next → 999999           sourceNextNotInUse
      rel 64.dst_prev → 70               targetPrev* (back-ref class)
  J5  node 20.next_prop → 999999         propertyNotInUse
      node 21.next_prop → 85 (prev=84)   propertyNotFirstInChain
      node 22.next_prop → 92 (node 23's) propertyForOtherOwner
                                         (+ J10 multipleOwners on 92 and
                                          orphanChain on abandoned 88)
  J6  prop 121.prev_prop → 777777        prevNotInUse (+ back-ref side
                                         effect on 120)
      prop 130.next_prop → 124           nextDoesNotReferenceBack
  J7  prop 140.key_id → -3               invalidPropertyKey
      prop 141.key_id → 77               keyNotInUse
  P6  prop 142.value_string → 'junk'     invalidPropertyValue (INT slot)
  J9  property_keys 2.name → ''          emptyName (PROPERTY_KEY)
      relationship_types 0.name → ''     emptyName (RELATIONSHIP_LABEL)

NeoStore singleton family (`NeoStoreCheck.java:29-50`, r6 addition —
graph_props.parquet is built here as a 7-record chain 0→…→5 plus one
extra head, replacing the generator's 2-record default so every rule
has a corruption):

  GP  gp 2.next_prop → 999999            nextNotInUse (+ back-ref side
                                         effect on gp 3)
      gp 4.key_id → 77                   keyNotInUse
      gp 5.owner_id → 9                  propertyForOtherOwner
      gp 1.value_long → 42 (STRING slot) invalidPropertyValue
      gp 6.prev_prop = -1 (second head)  propertyChainHeadCount

Run with table names as argv to rewrite only those files (e.g.
``python tools/gen_checker_fixture.py graph_props``) — the five
original store files are committed and must stay byte-identical.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import SparkSession

from neo4j_enterprise_spark.graph.generator import generate_graph

OUT = os.path.join(os.path.dirname(__file__), "..", "fixtures", "checker")


def main():
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    g = generate_graph(spark, node_count=500)
    tables = {name: df.toPandas().sort_values("id").reset_index(drop=True)
              for name, df in g.tables().items() if name != "graph_props"}

    nodes, rels, props = tables["nodes"], tables["relationships"], tables["properties"]
    keys, rtypes = tables["property_keys"], tables["relationship_types"]

    def set_at(df, id_, col, val):
        idx = df.index[df["id"] == id_]
        assert len(idx) == 1, (col, id_)
        df.loc[idx, col] = val

    # J1 — node.next_rel family
    set_at(nodes, 10, "next_rel", 999_999)
    r36 = rels[rels["id"] == 36].iloc[0]
    assert r36["src"] != 11 and r36["dst"] != 11, "pick a rel not touching node 11"
    set_at(nodes, 11, "next_rel", 36)
    r37 = rels[rels["id"] == 37].iloc[0]
    assert r37["src"] == 12 and r37["src_prev"] == 36
    set_at(nodes, 12, "next_rel", 37)
    # J2/J4/J3 — relationship store
    set_at(rels, 60, "type_id", -1)
    set_at(rels, 61, "type_id", 9)
    set_at(rels, 62, "src", 888_888)
    set_at(rels, 63, "src_next", 999_999)
    set_at(rels, 64, "dst_prev", 70)
    # J5 — owner.next_prop family
    set_at(nodes, 20, "next_prop", 999_999)
    p85 = props[props["id"] == 85].iloc[0]
    assert p85["prev_prop"] == 84 and p85["owner_id"] == 21
    set_at(nodes, 21, "next_prop", 85)
    p92 = props[props["id"] == 92].iloc[0]
    assert p92["prev_prop"] == -1 and p92["owner_id"] == 23
    set_at(nodes, 22, "next_prop", 92)
    # J6/J7/P6 — property store
    set_at(props, 121, "prev_prop", 777_777)
    set_at(props, 130, "next_prop", 124)
    set_at(props, 140, "key_id", -3)
    set_at(props, 141, "key_id", 77)
    p142 = props[props["id"] == 142].iloc[0]
    assert p142["vtype"] == "INT"
    set_at(props, 142, "value_string", "junk")
    # J9 — dictionaries
    set_at(keys, 2, "name", "")
    set_at(rtypes, 0, "name", "")

    # NeoStore singleton (GP family) — hand-built 7-record chain so each
    # `NeoStoreCheck.java:29-50` rule has a corruption. Schema matches
    # generator.py's graph_props exactly; key ids 0/1/2 are the live
    # INTEGER/STRING/ARRAY dictionary entries.
    import pandas as pd

    vt = ["INT", "STRING", "ARRAY", "INT", "STRING", "ARRAY", "INT"]
    gp = pd.DataFrame(
        {
            "id": list(range(7)),
            "in_use": [True] * 7,
            "owner_id": [0] * 7,
            "owner_kind": ["graph"] * 7,
            "seq": list(range(7)),
            "key_id": [0, 1, 2, 0, 1, 2, 0],
            "vtype": vt,
            "value_long": [7 + i if t == "INT" else None for i, t in enumerate(vt)],
            "value_string": [
                f"graph-prop-{i}" if t == "STRING" else None for i, t in enumerate(vt)
            ],
            "value_array": [[1, 2, 3] if t == "ARRAY" else None for t in vt],
            "prev_prop": [-1, 0, 1, 2, 3, 4, -1],
            "next_prop": [1, 2, 3, 4, 5, -1, -1],
        }
    )
    set_at(gp, 2, "next_prop", 999_999)  # nextNotInUse (+ gp3 back-ref side effect)
    set_at(gp, 4, "key_id", 77)  # keyNotInUse
    set_at(gp, 5, "owner_id", 9)  # propertyForOtherOwner
    set_at(gp, 1, "value_long", 42)  # invalidPropertyValue (STRING slot)
    # gp 6 is the second chain head -> propertyChainHeadCount n=2
    tables["graph_props"] = gp

    os.makedirs(OUT, exist_ok=True)
    # Schemas must survive the pandas round-trip exactly: rebuild from the
    # Spark schema so int64/bool/string/list<int> land typed, not object.
    spark_types = {
        name: {f.name: f.dataType.simpleString() for f in df.schema.fields}
        for name, df in g.tables().items()
    }
    pa_map = {
        "bigint": pa.int64(), "int": pa.int32(), "boolean": pa.bool_(),
        "string": pa.string(), "array<int>": pa.list_(pa.int32()),
    }
    only = set(sys.argv[1:])
    if not only:
        # The five original fixture files are committed oracle inputs and
        # must stay byte-identical; a no-arg run would rewrite all six
        # (and a pandas/pyarrow version bump would silently perturb
        # them). Require explicit table names.
        sys.exit(
            "refusing to rewrite committed fixtures: pass explicit table "
            f"names to regenerate, e.g. `{sys.argv[0]} graph_props`; "
            f"known tables: {sorted(tables)}"
        )
    unknown = only - set(tables)
    if unknown:
        sys.exit(f"unknown tables: {sorted(unknown)}; known: {sorted(tables)}")
    for name, pdf in tables.items():
        if name not in only:
            continue
        schema = pa.schema(
            [(c, pa_map[spark_types[name][c]]) for c in pdf.columns]
        )
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
            os.path.join(OUT, f"{name}.parquet"),
        )
        print(name, len(pdf), "rows")
    spark.stop()


if __name__ == "__main__":
    main()
