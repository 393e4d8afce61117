import sys; sys.path.insert(0, "/root/repo")
from mongoesindexer_spark.session import get_spark
import __spark_entry__ as E
spark = get_spark("verify", master="local[4]", shuffle_partitions=4)
df = E.entry(spark)
print("entry rows:", df.count(), "cols:", df.columns[:6])
qs = E.queries(); osql = E.oracle_sql()
print("queries:", len(qs), "oracles:", len(osql))
for name in ["ft_bm25_wand_topk", "config_pipeline", "lookup_join"]:
    out = qs[name](spark, "/root/testdata/sf0.001")
    print(name, "->", out.count(), "rows")
spark.stop()
