import pyarrow as pa, pyarrow.parquet as pq, datetime as dt, os
rows = []
words = ["quick","brown","fox","jumps","lazy","dog","data","index","spark","engine",
         "web","page","crawl","text","search","rank","score","term","block","merge"]
for i in range(20):
    txt = " ".join(words[(i+j) % 20] for j in range(12)) + f" doc{i}"
    rows.append({"url": f"https://ex.com/{i}", "warc_ts": dt.datetime(2025,1,1,0,0,i),
                 "html": ("<html>"+txt+"</html>").encode(), "text": txt, "lang": "en"})
t = pa.Table.from_pylist(rows, schema=pa.schema([
    ("url", pa.string()), ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()), ("text", pa.string()), ("lang", pa.string())]))
os.makedirs("/root/repo/.verify/pages", exist_ok=True)
pq.write_table(t, "/root/repo/.verify/pages/part-0.parquet")
print("wrote 20 pages")
