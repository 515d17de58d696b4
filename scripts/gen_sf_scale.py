#!/usr/bin/env python3
"""Scale-up generator for an sf1-class REHEARSAL table set (driver-side
tooling, like check_oracle.py — not library code).

Replicates a source sf directory K times with consistent key offsets:
every fact/bridge key (custkey, orderkey, suppkey, partkey, event/user
ids, doc/vec ids) moves by k*OFFSET per copy, so foreign-key joins hold
within each copy and copies never collide. Dimension enums
(region/nation) are NOT scaled — only facts grow, like a real corpus.
Document texts get a per-copy suffix token so replicas are textual
NEAR-dups of the originals (exercising the dedup family's pair joins
at scale) rather than exact clones.

The oracle gate is engine-vs-engine on the SAME files, so parity needs
schema fidelity, not distribution fidelity: tables are transformed in
pyarrow and written back with the source schema asserted equal
(preserving the TIMESTAMP(NANOS) encoding Spark reads via
nanosAsLong).

Usage: python3 scripts/gen_sf_scale.py /root/testdata/sf0.1 /tmp/sf1 10
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC, DST, K = sys.argv[1], sys.argv[2], int(sys.argv[3])
OFFSET = 10_000_000  # far above any key at the source scale

# table -> columns to offset by k*OFFSET
ID_COLS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
UNSCALED = {"region", "nation"}


def copy_k(t: pa.Table, name: str, k: int) -> pa.Table:
    if k == 0:
        return t
    out = t
    for col in ID_COLS[name]:
        i = out.schema.get_field_index(col)
        field = out.schema.field(i)
        shifted = pc.add(out.column(i), pa.scalar(k * OFFSET)).cast(field.type)
        out = out.set_column(i, field, shifted)
    if name == "events":
        # spread each replica over its OWN disjoint time span (source
        # span + 1h gap per copy): otherwise K copies pile onto the same
        # month and time-window self-joins (q44's 5-minute pairs) scale
        # ~K^2 in OUTPUT volume — a generator artifact, not a plan
        # property. With disjoint spans, window-pair density scales ~K
        # like a real corpus that grows by covering more time.
        i = out.schema.get_field_index("ts")
        field = out.schema.field(i)
        ts = out.column(i)
        lo, hi = pc.min(ts).cast(pa.int64()), pc.max(ts).cast(pa.int64())
        unit = field.type.unit
        hour = {"s": 3600, "ms": 3600_000, "us": 3600_000_000,
                "ns": 3600_000_000_000}[unit]
        span = (hi.as_py() - lo.as_py()) + hour
        shifted = pc.add(ts.cast(pa.int64()),
                         pa.scalar(k * span)).cast(field.type)
        out = out.set_column(i, field, shifted)
    if name == "documents":
        i = out.schema.get_field_index("text")
        field = out.schema.field(i)
        suffixed = pc.binary_join_element_wise(
            out.column(i).cast(pa.string()), f" rep{k}", "").cast(field.type)
        out = out.set_column(i, field, suffixed)
    return out


def main() -> None:
    import os
    os.makedirs(DST, exist_ok=True)
    for name in ID_COLS:
        src = pq.read_table(f"{SRC}/{name}.parquet")
        if name in UNSCALED:
            out = src
        else:
            out = pa.concat_tables(
                [copy_k(src, name, k) for k in range(K)]).combine_chunks()
        pq.write_table(out, f"{DST}/{name}.parquet")
        back = pq.read_table(f"{DST}/{name}.parquet")
        assert back.schema.equals(src.schema), (
            f"{name}: schema drifted\nsrc={src.schema}\ndst={back.schema}")
        print(f"{name}: {src.num_rows} -> {back.num_rows} rows")


if __name__ == "__main__":
    main()
