# Faithful single-node simulation of the reference pipeline on one corpus:
# map (word_count.py tokenize) -> partition (hash_partitioner) + per-region
# sort (mapper.py:124-136) -> JSON write/read roundtrip (the shuffle
# serialization, mapper.py:145-160/200-202) -> group -> sum -> JSON sink.
import binascii, json, re, sys, time, tempfile, os

path = sys.argv[1] if len(sys.argv) > 1 else '/root/reference/onegin'
t0 = time.time()
data = open(path, encoding='utf-8').read()
tokens = [w.strip(',.').lower() for w in re.compile(r'\w+').findall(data)]
tuples = [(w, 1) for w in tokens if w]
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
    result = [(k, sum(vs)) for k, vs in sorted(grouped.items())]
    o = tempfile.NamedTemporaryFile('w', suffix='.json', delete=False)
    json.dump(result, o); o.close(); outfiles.append(o.name)
    out.extend(result)
for fn in files + outfiles: os.unlink(fn)
t1 = time.time()
print(f"reference-pipeline onegin: {t1-t0:.3f}s, {len(out)} distinct words, {len(tuples)} tokens")
