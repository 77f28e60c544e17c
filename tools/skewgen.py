"""Generate a celebrity-skew twin of an sf fixture dir at
/tmp/skewdata/sf{sf}-skew: same schemas, same small dims, but ONE hot key
per big table amplified ~100x (99 modified copies of the hot key's rows).

Uniqueness contracts preserved (FIXTURES.md):
- events: copies get fresh event_id  -> (user_id, ts, event_id) stays unique
- lineitem: copies get l_linenumber + 1000*k -> 6-col tail stays unique
- orders: copies get fresh o_orderkey
- documents: copies get fresh doc_id (same text -> exact-dup group of 100)
- embeddings: copies get fresh vec_id (same vector -> one hot IVF cell)
"""
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pandas as pd

# Usage: python tools/skewgen.py [sf] [src] [dst]
# (default sf 0.01; src/dst default to the driver fixture at that sf and
# /tmp/skewdata/sf{sf}-skew. Pass src/dst explicitly to skew a derived
# twin instead, e.g. the r11 sf1 replication twin:
#   python tools/skewgen.py 1 /tmp/scaledata/sf1 /tmp/skewdata/sf1-skew)
_SF = sys.argv[1] if len(sys.argv) > 1 else "0.01"
SRC = sys.argv[2] if len(sys.argv) > 2 else f"/root/testdata/sf{_SF}"
DST = sys.argv[3] if len(sys.argv) > 3 else f"/tmp/skewdata/sf{_SF}-skew"
COPIES = 99
os.makedirs(DST, exist_ok=True)

def write(name, pdf, schema):
    pq.write_table(pa.Table.from_pandas(pdf, schema=schema, preserve_index=False),
                   f"{DST}/{name}.parquet")

for t in ["region", "nation", "customer", "supplier", "part"]:
    tb = pq.read_table(f"{SRC}/{t}.parquet")
    pq.write_table(tb, f"{DST}/{t}.parquet")
    print(t, "copied", tb.num_rows)

# events: hot user
tb = pq.read_table(f"{SRC}/events.parquet")
pdf = tb.to_pandas()
hot_user = pdf["user_id"].value_counts().idxmax()
hot = pdf[pdf["user_id"] == hot_user]
max_id = pdf["event_id"].max()
copies = []
for k in range(1, COPIES + 1):
    c = hot.copy()
    c["event_id"] = max_id + (k - 1) * len(hot) + range(1, len(hot) + 1)
    copies.append(c)
out = pd.concat([pdf] + copies, ignore_index=True)
assert out["event_id"].is_unique
write("events", out, tb.schema)
print("events:", len(pdf), "->", len(out), "hot user", hot_user,
      "rows", len(hot), "->", len(hot) * (COPIES + 1))

# lineitem: hot part
tb = pq.read_table(f"{SRC}/lineitem.parquet")
pdf = tb.to_pandas()
hot_part = pdf["l_partkey"].value_counts().idxmax()
hot = pdf[pdf["l_partkey"] == hot_part]
assert pdf["l_linenumber"].max() < 1000
copies = []
for k in range(1, COPIES + 1):
    c = hot.copy()
    c["l_linenumber"] = (c["l_linenumber"] + 1000 * k).astype("int32")
    copies.append(c)
out = pd.concat([pdf] + copies, ignore_index=True)
tail = ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_shipdate", "l_extendedprice"]
assert not out.duplicated(subset=tail).any()
write("lineitem", out, tb.schema)
print("lineitem:", len(pdf), "->", len(out), "hot part", hot_part,
      "rows", len(hot), "->", len(hot) * (COPIES + 1))

# orders: hot customer
tb = pq.read_table(f"{SRC}/orders.parquet")
pdf = tb.to_pandas()
hot_cust = pdf["o_custkey"].value_counts().idxmax()
hot = pdf[pdf["o_custkey"] == hot_cust]
max_ok = pdf["o_orderkey"].max()
copies = []
for k in range(1, COPIES + 1):
    c = hot.copy()
    c["o_orderkey"] = max_ok + (k - 1) * len(hot) + range(1, len(hot) + 1)
    copies.append(c)
out = pd.concat([pdf] + copies, ignore_index=True)
assert out["o_orderkey"].is_unique
write("orders", out, tb.schema)
print("orders:", len(pdf), "->", len(out), "hot cust", hot_cust,
      "rows", len(hot), "->", len(hot) * (COPIES + 1))

# documents: hot doc text (exact-dup family of 100)
tb = pq.read_table(f"{SRC}/documents.parquet")
pdf = tb.to_pandas()
hot = pdf.iloc[[0]]
max_id = pdf["doc_id"].max()
copies = []
for k in range(1, COPIES + 1):
    c = hot.copy()
    c["doc_id"] = max_id + k
    copies.append(c)
out = pd.concat([pdf] + copies, ignore_index=True)
assert out["doc_id"].is_unique
write("documents", out, tb.schema)
print("documents:", len(pdf), "->", len(out), "hot doc", int(hot["doc_id"].iloc[0]))

# embeddings: hot vector (one hot cell/bucket)
tb = pq.read_table(f"{SRC}/embeddings.parquet")
pdf = tb.to_pandas()
hot = pdf.iloc[[0]]
max_id = pdf["vec_id"].max()
copies = []
for k in range(1, COPIES + 1):
    c = hot.copy()
    c["vec_id"] = max_id + k
    copies.append(c)
out = pd.concat([pdf] + copies, ignore_index=True)
assert out["vec_id"].is_unique
write("embeddings", out, tb.schema)
print("embeddings:", len(pdf), "->", len(out), "hot vec", int(hot["vec_id"].iloc[0]))
print("GEN_OK")
