import sys; sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import duckdb, pandas as pd, hashlib, traceback
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master('local[16]')
         .config('spark.sql.shuffle.partitions','32')
         .config('spark.ui.enabled','false').getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
con = duckdb.connect()
for t in ("region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"):
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

def _canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return hashlib.md5(df.to_csv(index=False).encode()).hexdigest()

qs = e.queries()
# Scale-adaptive oracles: the registered static oracle_sql() is the
# driver-scale (sf0.01) rendering; all_scaled_oracles re-renders the
# data-adaptive entries (LSH key width, packer bucket count) for the
# audited SF and is the identical dict at driver scale (tested).
from relational_to_doc_oriented_nosql_migrator_spark.operators import all_scaled_oracles
ors = all_scaled_oracles(sf)
bad = []
for qid in qs:
    try:
        sdf = qs[qid](spark, sf).toPandas()
        odf = con.execute(ors[qid]).df()
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_hash = _canon(sdf) == _canon(odf)
        if not (ok_rows and ok_cols and ok_hash):
            dt = {c: (str(sdf[c].dtype), str(odf[c].dtype)) for c in sdf.columns if c in odf.columns and str(sdf[c].dtype) != str(odf[c].dtype)}
            bad.append((qid, ok_rows, ok_cols, ok_hash, dt))
    except Exception as ex:
        bad.append((qid, "ERR", type(ex).__name__, str(ex)[:120], {}))
print("checked", len(qs))
for b in bad:
    print("MISMATCH:", b)
if not bad:
    print("ALL GREEN")

# Docstring note: this replicates the external driver's comparison path
# (toPandas vs duckdb .df(), sorted-CSV md5) more faithfully than
# tests/oracle_harness (which canonicalizes values individually) — run it
# before each round's cutoff to catch pandas dtype drift.
