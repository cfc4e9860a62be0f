import ctypes, numpy as np
lib = ctypes.CDLL("/tmp/libcleora_asan.so")
import cleora_tpu.native as natmod
natmod._bind(lib)

import numpy as np
rng = np.random.default_rng(3)
cases = []
# pairs
cases.append(([f"n{rng.integers(0,500)} n{rng.integers(0,500)}" for _ in range(5000)], "complex::reflexive::node", 16))
# trimming-heavy hyperedges
cases.append(([" ".join(f"e{rng.integers(0,80)}" for _ in range(rng.integers(2,40))) for _ in range(500)], "complex::reflexive::e", 8))
# two-column with tabs, commas, malformed
cases.append((["u1\tp1 p2", "u2\tp1", "bad line no tab", "u3\tp2 p3"], "user complex::product", 16))
cases.append((["x, a b", "y, b c", "", "x, c"], "tag complex::item", 16))
cases.append((["café naïve", "naïve 日本語"], "complex::reflexive::w", 16))

for lines, columns, trim in cases:
    from cleora_tpu.graph.columns import parse_fields, create_relation_descriptor
    cols = parse_fields(columns)
    create_relation_descriptor(cols)
    buf = "\n".join(lines).encode("utf-8")
    ncols = len(cols)
    cf = (ctypes.c_uint8 * ncols)(*[int(c.complex) for c in cols])
    rf = (ctypes.c_uint8 * ncols)(*[int(c.reflexive) for c in cols])
    h = lib.ct_build(buf, len(buf), ncols, cf, rf, trim, 4)
    err = lib.ct_error(h)
    if err: print("error:", err.decode())
    n = lib.ct_num_entities(h); nnz = lib.ct_num_edges(h)
    hashes = np.empty(n, np.uint64); cids = np.empty(n, np.uint8)
    rs = np.empty(n, np.float32); ip = np.empty(n+1, np.int64)
    idx = np.empty(nnz, np.int32); lv = np.empty(nnz, np.float32); sv = np.empty(nnz, np.float32)
    lib.ct_get_arrays(h, *(a.ctypes.data_as(ctypes.c_void_p) for a in (hashes, cids, rs, ip, idx, lv, sv)))
    lens = np.empty(n, np.uint32); lib.ct_id_lens(h, lens.ctypes.data_as(ctypes.c_void_p))
    blob = np.empty(int(lens.sum()), np.uint8); lib.ct_id_bytes(h, blob.ctypes.data_as(ctypes.c_void_p))
    lib.ct_free(h)
    print("ok", n, nnz)

# file mode
import tempfile, os
d = tempfile.mkdtemp()
p1 = os.path.join(d, "a.tsv")
open(p1, "wb").write(b"a b\nb c\n\n\xff\xfe bad utf8\nc a\ncaf\xc3\xa9 d\n")
paths = (ctypes.c_char_p * 2)(p1.encode(), b"/nonexistent/file.tsv")
cf = (ctypes.c_uint8 * 1)(1); rf = (ctypes.c_uint8 * 1)(1)
h = lib.ct_build_files(paths, 2, 1, cf, rf, 16, 2)
print("files ok", lib.ct_num_entities(h), lib.ct_num_edges(h))
lib.ct_free(h)
# streaming core: spills (tiny run threshold), k-way merge, file-mode UTF-8
# skips, row filter, and the index-only (emit=0) pass
os.environ["CLEORA_STREAM_RUN_PAIRS"] = "4096"
from cleora_tpu.graph import stream as stmod
for row_range, emit in ((None, True), ((5, 40), True), (None, False)):
    sd = tempfile.mkdtemp()
    cf1 = (ctypes.c_uint8 * 1)(1); rf1 = (ctypes.c_uint8 * 1)(1)
    hs = lib.ct_stream_open(1, cf1, rf1, 8, 2, sd.encode(), 64 << 20)
    if not emit:
        lib.ct_stream_set_emit(hs, 0)
    if row_range is not None:
        lib.ct_stream_set_row_filter(hs, *row_range)
    rng2 = np.random.default_rng(9)
    for _ in range(4):
        chunk = "\n".join(
            " ".join(f"s{rng2.integers(0, 200)}"
                     for _ in range(rng2.integers(1, 20)))
            for _ in range(2000)) + "\n"
        assert lib.ct_stream_feed(hs, chunk.encode(), len(chunk.encode()), 1) == 0
    bad = b"x y\n\xed\xa0\x80 q\nz w\n"
    assert lib.ct_stream_feed(hs, bad, len(bad), 1) == 0
    src = np.arange(3000, dtype=np.int64) % 97
    dst = (np.arange(3000, dtype=np.int64) * 7) % 97
    assert lib.ct_stream_feed_pairs(
        hs, src.ctypes.data_as(ctypes.c_void_p),
        dst.ctypes.data_as(ctypes.c_void_p), 3000) == 0
    if emit:
        assert lib.ct_stream_finish(hs) == 0, lib.ct_stream_error(hs)
        print("stream ok", lib.ct_stream_num_entities(hs),
              lib.ct_stream_num_edges(hs), "runs", lib.ct_stream_num_runs(hs))
    else:
        print("stream index-only ok", lib.ct_stream_num_entities(hs))
    lib.ct_stream_free(hs)

# oversized-edge paths: a clique bigger than the whole pending buffer
# (fast path) and a huge-trim_n untrimmed edge bigger than the remainder
# (trim path) — both previously overflowed/spun; must chunk with flushes
os.environ["CLEORA_STREAM_RUN_PAIRS"] = "4096"
for lines_, trim in (
    ([" ".join(f"t{i}" for i in range(750)), "t1 t2"], 1000),
    ([" ".join(f"b{i}" for i in range(1100)),
      " ".join(f"s{i}" for i in range(800))], 1000),
):
    sd = tempfile.mkdtemp()
    cf1 = (ctypes.c_uint8 * 1)(1); rf1 = (ctypes.c_uint8 * 1)(1)
    hs = lib.ct_stream_open(1, cf1, rf1, trim, 2, sd.encode(), 64 << 20)
    blob = ("\n".join(lines_) + "\n").encode()
    assert lib.ct_stream_feed(hs, blob, len(blob), 0) == 0
    assert lib.ct_stream_finish(hs) == 0, lib.ct_stream_error(hs)
    print("oversized-edge ok", lib.ct_stream_num_entities(hs),
          lib.ct_stream_num_edges(hs))
    lib.ct_stream_free(hs)

print("ALL SANITIZER CASES PASSED")
