import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")
import __spark_entry__ as em
from slower_whisper_spark.session import get_spark

import os

SF = os.environ.get("SF", "/root/testdata/sf0.001")
# oracles with data-derived literals (kll_drift_psi) must build them from
# the SAME tier the duckdb views read, even when SF wasn't exported
os.environ["SWS_ORACLE_SF_DIR"] = SF
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

spark = get_spark(master="local[8]", shuffle_partitions=8)
spark.sparkContext.setLogLevel("ERROR")

names = sys.argv[1:]
Q, O = em.queries(), em.oracle_sql()

def norm(df):
    df = df[sorted(df.columns)]
    rows = []
    for _, r in df.iterrows():
        vals = []
        for v in r:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                vals.append("NULL")
            elif isinstance(v, bool):
                vals.append(str(int(v)))
            elif isinstance(v, float):
                vals.append(f"{v:.6f}")
            else:
                vals.append(str(v))
        rows.append("|".join(vals))
    return sorted(rows)

for name in names:
    print(f"===== {name}")
    try:
        spdf = Q[name](spark, SF).toPandas()
    except Exception as e:
        print("SPARK ERROR:", type(e).__name__, str(e)[:300])
        continue
    if name not in O:
        print("no oracle; rows:", len(spdf))
        continue
    try:
        odf = con.sql(O[name]).df()
    except Exception as e:
        print("DUCKDB ERROR:", str(e)[:300])
        continue
    spdf.columns = [c.lower() for c in spdf.columns]
    odf.columns = [c.lower() for c in odf.columns]
    if sorted(spdf.columns) != sorted(odf.columns):
        print("COLS spark:", sorted(spdf.columns), "oracle:", sorted(odf.columns))
        continue
    if len(spdf) != len(odf):
        print("ROWS spark:", len(spdf), "oracle:", len(odf))
    l, r = norm(spdf), norm(odf)
    bad = [(a, b) for a, b in zip(l, r) if a != b]
    print("match" if (l == r) else f"MISMATCH {len(bad)}; first: {bad[:3]}")
