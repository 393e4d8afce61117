import pyarrow as pa, pyarrow.parquet as pq, datetime as dt, os
rows = [
 {"op":"update","url":"https://ex.com/0","warc_ts":dt.datetime(2025,2,1),
  "html":b"<html>zebra unique marker</html>","text":"zebra unique marker","lang":"en"},
 {"op":"insert","url":"https://ex.com/new","warc_ts":dt.datetime(2025,2,2),
  "html":b"<html>zebra fresh doc</html>","text":"zebra fresh doc","lang":"en"},
 {"op":"delete","url":"https://ex.com/1","warc_ts":dt.datetime(2025,2,3),
  "html":None,"text":None,"lang":None},
]
t = pa.Table.from_pylist(rows, schema=pa.schema([
    ("op", pa.string()), ("url", pa.string()), ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()), ("text", pa.string()), ("lang", pa.string())]))
os.makedirs("/root/repo/.verify/upd", exist_ok=True)
pq.write_table(t, "/root/repo/.verify/upd/part-0.parquet")
print("wrote updates")
