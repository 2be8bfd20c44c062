# Faithful single-node simulation of the reference pipeline for its SECOND
# job, max_year_temp: map (json.loads chunk -> (year, temp) per
# max_year_temp.py:19-23) -> partition (hash_partitioner.py:4-10) + per-
# region sort (mapper.py:124-136) -> JSON write/read roundtrip (the shuffle
# serialization, mapper.py:145-160/200-202) -> sort-group (Reducer
# .combine_data, max_year_temp.py:38-58) -> max (:60-62) -> JSON sink.
# One line of the corpus file == one DFS chunk (the reference maps chunks).
import binascii, json, sys, time, tempfile, os

path = sys.argv[1] if len(sys.argv) > 1 else '/tmp/temp_x1.json'
t0 = time.time()
tuples = []
for line in open(path, encoding='utf-8'):
    for t in json.loads(line):
        tuples.append((int(str(t[0])[:4]), t[1]))
RDS = 4
regions = {}
for k, v in tuples:
    r = int(binascii.hexlify(str(k).encode()), 16) % RDS + 1
    regions.setdefault(r, []).append((k, v))
files = []
for r, tups in regions.items():
    tups.sort(key=lambda x: x[0])
    f = tempfile.NamedTemporaryFile('w', suffix='.json', delete=False)
    json.dump(tups, f); f.close(); files.append(f.name)
out = []
outfiles = []
for fn in files:
    tups = [(x[0], x[1]) for x in json.load(open(fn))]
    grouped = {}
    for k, v in tups: grouped.setdefault(k, []).append(v)
    result = [(k, max(vs)) for k, vs in sorted(grouped.items())]
    o = tempfile.NamedTemporaryFile('w', suffix='.json', delete=False)
    json.dump(result, o); o.close(); outfiles.append(o.name)
    out.extend(result)
for fn in files + outfiles: os.unlink(fn)
t1 = time.time()
chk = sum(v for _, v in out)
print(f"reference-maxtemp {path}: {t1-t0:.3f}s, {len(out)} years, {len(tuples)} tuples, sum_of_max {chk:.1f}")
