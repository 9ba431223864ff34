#!/usr/bin/env python3
"""Strip writer schema metadata from GenScale's parquet outputs.

Spark embeds its own schema in the parquet footer
(org.apache.spark.sql.parquet.row.metadata); on read-back that stored
schema FORCES TIMESTAMP_NTZ column types regardless of
spark.sql.parquet.inferTimestampNTZ.enabled, while the driver's
pyarrow-written testdata (no footer metadata) reads as TIMESTAMP under
graft's sessions. Scaled testdata must read byte-for-byte like the
driver's, so this post-pass round-trips each table through pyarrow
with the footer metadata dropped — physical types (micros NTZ
timestamps, list<float> embeddings) are preserved by the arrow schema.

Usage: python3 scripts/normalize_parquet.py <dir>   (e.g. target/testdata/sf1)
"""
import sys
import glob
import pyarrow.parquet as pq

d = sys.argv[1]
for path in sorted(glob.glob(f"{d}/*.parquet")):
    tbl = pq.read_table(path)
    pq.write_table(tbl.replace_schema_metadata(None), path,
                   compression="snappy", use_compliant_nested_type=True)
    print(f"normalized {path}")
