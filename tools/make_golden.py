#!/usr/bin/env python3
"""Golden-oracle generator for the graft-native queries DuckDB cannot
express (q12b chunk pipeline, q16 simhash pairs, q21 fingerprints,
q22 ingest index).

This is an INDEPENDENT from-scratch Python re-implementation of the same
published algorithms the Scala engine implements (LangChain
RecursiveCharacterTextSplitter merge semantics, ATX-heading MDX split,
FNV-1a trigram hashing embedder, 64-bit token SimHash, polynomial rolling
hash) — NOT a dump of Spark output. The driver's DuckDB oracle then reads
the committed golden parquet, so a divergence in either implementation
fails the correctness gate.

Float-score note: the engine's `topk_by` aggregate canonicalizes -0.0
scores to +0.0 (an IEEE total-order artifact, numerically identical).
No golden file currently carries a score that can be exactly -0.0
(q70's MMR scores are rounded similarities of non-antipodal vectors),
but if one ever does, canonicalize here the same way or the bit-exact
compare will flag a spurious diff.

Driver-side tooling only (python/duckdb/pyarrow are not available to the
shipped Scala engine). Usage:

    python3 tools/make_golden.py /root/testdata/sf0.01 /root/repo/golden
"""
import hashlib
import re
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq

MASK32 = 0xFFFFFFFF
MASK64 = 0xFFFFFFFFFFFFFFFF

CHUNK_SIZE, CHUNK_OVERLAP, EMBED_DIM = 80, 16, 64


# --- LangChain-semantics recursive character splitter -------------------

SEPARATORS = ["\n\n", "\n", " ", ""]


def _join_docs(docs, sep):
    t = sep.join(docs).strip()
    return t if t else None


def _merge_splits(splits, sep, size, overlap):
    sep_len = len(sep)
    docs, current, total = [], [], 0
    for d in splits:
        l = len(d)
        if total + l + (sep_len if current else 0) > size:
            if current:
                doc = _join_docs(current, sep)
                if doc is not None:
                    docs.append(doc)
                while total > overlap or (
                        total + l + (sep_len if current else 0) > size
                        and total > 0):
                    total -= len(current[0]) + (sep_len if len(current) > 1 else 0)
                    current.pop(0)
        current.append(d)
        total += l + (sep_len if len(current) > 1 else 0)
    doc = _join_docs(current, sep)
    if doc is not None:
        docs.append(doc)
    return docs


def chunk_text(text, size, overlap, separators=None):
    if not text:
        return []
    seps = SEPARATORS if separators is None else separators
    sep, new_seps = seps[-1], None
    for i, s in enumerate(seps):
        if s == "":
            sep = s
            break
        if s in text:
            sep, new_seps = s, seps[i + 1:]
            break
    splits = [p for p in (text.split(sep) if sep else list(text)) if p]
    out, good = [], []
    for s in splits:
        if len(s) < size:
            good.append(s)
        else:
            if good:
                out.extend(_merge_splits(good, sep, size, overlap))
                good = []
            if new_seps is None:
                out.append(s)
            else:
                out.extend(chunk_text(s, size, overlap, new_seps))
    if good:
        out.extend(_merge_splits(good, sep, size, overlap))
    return out


# --- hash kernels -------------------------------------------------------

def fnv32(s):
    h = 0x811C9DC5
    for c in s:
        h ^= ord(c)
        h = (h * 0x01000193) & MASK32
    return h


def to_signed32(h):
    return h - (1 << 32) if h >= (1 << 31) else h


def to_signed64(h):
    return h - (1 << 64) if h >= (1 << 63) else h


def hash_embed(text, dim):
    out = [0.0] * dim
    if not text or dim <= 0:
        return out
    s = "\x02" + text + "\x03"
    for i in range(len(s) - 2):
        h = fnv32(s[i:i + 3])
        hs = to_signed32(h)
        bucket = ((hs % dim) + dim) % dim
        out[bucket] += -1.0 if (h & 0x80000000) else 1.0
    nrm = sum(v * v for v in out) ** 0.5
    if nrm > 0:
        # float32 rounding mirrors the engine's Array[Float] storage
        import struct
        out = [struct.unpack('f', struct.pack('f', v / nrm))[0] for v in out]
    return out


def fnv64(b):
    h = 0xCBF29CE484222325
    for byte in b:
        h ^= byte
        h = (h * 0x100000001B3) & MASK64
    return h


def simhash64(text):
    if text is None:
        return 0
    weights = [0] * 64
    for tok in re.split(r"\s+", text):
        if not tok:
            continue
        # engine hashes char codes (UTF-16 units); fixture is ASCII so
        # char code == byte value
        h = 0xCBF29CE484222325
        for c in tok:
            h ^= ord(c)
            h = (h * 0x100000001B3) & MASK64
        for b in range(64):
            weights[b] += 1 if (h >> b) & 1 else -1
    out = 0
    for b in range(64):
        if weights[b] > 0:
            out |= 1 << b
    return to_signed64(out)


def rolling_hash(text):
    h = 0
    for c in text:
        h = (h * 1000003 + ord(c)) & MASK64
    return to_signed64(h)


# --- MDX pipeline (synthetic render -> section split -> chunk -> embed) --

def trim_ws(s):
    return re.sub(r"^\s+|\s+$", "", s)


def synthetic_mdx(text):
    words = text.split(" ")
    q = (len(words) + 3) // 4

    def seg(i):
        if i == 3:
            return " ".join(words[3 * q:])
        return " ".join(words[q * i:q * i + q])

    return ("## Context\n" + seg(0) + "\n## Overview\n" + seg(1) +
            "\n### Details\n" + seg(2) + "\n## Summary\n" + seg(3))


def split_sections(mdx):
    """ATX-heading split with neighbor headers — one dict per section."""
    parts = [p for p in re.split(r"(?m)(?=^#{1,6} .+$)", mdx)
             if len(trim_ws(p)) > 0]
    secs = []
    for p in parts:
        m = re.search(r"(?m)^(#{1,6} .+)$", p)
        header = trim_ws(m.group(1)) if m else ""
        if header:
            nl = p.find("\n")
            content = p if nl < 0 else p[nl + 1:]
        else:
            content = p
        secs.append({"header": header, "content": trim_ws(content)})
    for i, s in enumerate(secs):
        s["chunk_id"] = i + 1
        s["prev_header"] = secs[i - 1]["header"] if i > 0 else ""
        s["next_header"] = secs[i + 1]["header"] if i + 1 < len(secs) else ""
    return secs


def ingest_rows(doc_id, text):
    """(q12b row, q22 row) pairs for one document."""
    secs = split_sections(synthetic_mdx(text))
    pieces_per_sec = []
    for s in secs:
        if len(s["content"]) > CHUNK_SIZE:
            pieces = chunk_text(s["content"], CHUNK_SIZE, CHUNK_OVERLAP)
        else:
            pieces = [s["content"]]
        pieces_per_sec.append(pieces)
    total_chunks = sum(len(p) for p in pieces_per_sec)
    rows = []
    for s, pieces in zip(secs, pieces_per_sec):
        n = len(pieces)
        for idx, piece in enumerate(pieces):
            content = piece.replace("\n", " ") if n > 1 else piece
            header_stripped = s["header"].replace("## ", "", 1)
            embed_input = f"HEADER: {header_stripped} | CONTENT: {content}"
            emb = hash_embed(embed_input, EMBED_DIM)
            norm = round(sum(v * v for v in emb) ** 0.5, 4)
            rows.append({
                "doc_id": doc_id,
                "chunk_id": s["chunk_id"],
                "piece_id": idx + 1,
                "n_chars": len(content),
                "content_md5": hashlib.md5(content.encode()).hexdigest(),
                "norm": norm,
                "total_chunks": total_chunks,
            })
    return rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/golden"
    import os
    os.makedirs(out_dir, exist_ok=True)

    con = duckdb.connect()
    docs = con.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()

    # q12b + q22
    all_rows = []
    for doc_id, text in docs:
        all_rows.extend(ingest_rows(doc_id, text))
    q12b = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in all_rows], pa.int64()),
        "chunk_id": pa.array([r["chunk_id"] for r in all_rows], pa.int32()),
        "piece_id": pa.array([r["piece_id"] for r in all_rows], pa.int32()),
        "n_chars": pa.array([r["n_chars"] for r in all_rows], pa.int64()),
        "content_md5": pa.array([r["content_md5"] for r in all_rows], pa.string()),
    })
    pq.write_table(q12b, f"{out_dir}/q12b_chunk_pipeline.parquet")
    q22 = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in all_rows], pa.int64()),
        "chunk_id": pa.array([r["chunk_id"] for r in all_rows], pa.int32()),
        "piece_id": pa.array([r["piece_id"] for r in all_rows], pa.int32()),
        "n_chars": pa.array([r["n_chars"] for r in all_rows], pa.int64()),
        "norm": pa.array([r["norm"] for r in all_rows], pa.float64()),
        "total_chunks": pa.array([r["total_chunks"] for r in all_rows], pa.int32()),
    })
    pq.write_table(q22, f"{out_dir}/q22_ingest_index.parquet")

    # q21 fingerprints + q16 simhash near-dup pairs
    fps = [(doc_id, rolling_hash(text), simhash64(text)) for doc_id, text in docs]
    q21 = pa.table({
        "doc_id": pa.array([f[0] for f in fps], pa.int64()),
        "content_fp": pa.array([f[1] for f in fps], pa.int64()),
        "simhash": pa.array([f[2] for f in fps], pa.int64()),
    })
    pq.write_table(q21, f"{out_dir}/q21_fingerprints.parquet")

    # brute-force Hamming<=3 pairs; the engine's 4x16-bit banding is
    # complete for distance<=3 (pigeonhole), so the sets must be identical
    pairs = []
    for i in range(len(fps)):
        for j in range(i + 1, len(fps)):
            h = bin((fps[i][2] ^ fps[j][2]) & MASK64).count("1")
            if h <= 3:
                a, b = fps[i][0], fps[j][0]
                pairs.append((min(a, b), max(a, b), h))
    pairs.sort()
    q16 = pa.table({
        "d1": pa.array([p[0] for p in pairs], pa.int64()),
        "d2": pa.array([p[1] for p in pairs], pa.int64()),
        "hamming": pa.array([p[2] for p in pairs], pa.int64()),
    })
    pq.write_table(q16, f"{out_dir}/q16_simhash_neardup.parquet")

    # q70: MMR re-rank — independent greedy fold over the fixture
    # vectors. Mirrors the published MMR definition with the SAME
    # deterministic conventions the Scala engine documents (ascending
    # candidate-id iteration, strict > argmax, redundancy 0 for the
    # first pick), NOT the Scala code: a divergence in either fold
    # fails the gate.
    import math

    def cosine(x, y):
        d = nx = ny = 0.0
        for xi, yi in zip(x, y):
            d += xi * yi
            nx += xi * xi
            ny += yi * yi
        if nx == 0.0 or ny == 0.0:
            return 0.0
        return d / math.sqrt(nx * ny)

    emb = con.sql(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id").fetchall()
    vecs = [(int(vid), [float(c) for c in v]) for vid, v in emb]
    vmap = dict(vecs)
    LAM, CAND_K, SEL_K = 0.7, 20, 10
    mmr_rows = []
    for qid in range(10):
        qvec = vecs[qid][1]
        sims = [(vid, cosine(v, qvec)) for vid, v in vecs]
        top = sorted(sims, key=lambda t: (-t[1], t[0]))[:CAND_K]
        remaining = {vid: (s, vmap[vid]) for vid, s in sorted(top)}
        selected = []
        rank = 0
        while len(selected) < SEL_K and remaining:
            best_id, best_score = None, None
            for vid, (sim_q, v) in remaining.items():  # ascending vec_id
                if selected:
                    red = max(cosine(v, s) for s in selected)
                else:
                    red = 0.0
                score = LAM * sim_q - (1 - LAM) * red
                if best_score is None or score > best_score:
                    best_id, best_score = vid, score
            sim_q, v = remaining.pop(best_id)
            selected.append(v)
            rank += 1
            mmr_rows.append((qid, rank, best_id, best_score))
    q70 = pa.table({
        "query_id": pa.array([r[0] for r in mmr_rows], pa.int64()),
        "rank": pa.array([r[1] for r in mmr_rows], pa.int64()),
        "vec_id": pa.array([r[2] for r in mmr_rows], pa.int64()),
        "score": pa.array([r[3] for r in mmr_rows], pa.float64()),
    })
    pq.write_table(q70, f"{out_dir}/q70_mmr_rerank.parquet")

    # q91: merges-table BPE token counts — independent application of
    # the committed fixture merges (greedy lowest-rank pair, all
    # non-overlapping occurrences left-to-right, whitespace-split
    # words, no end-of-word marker), mirroring the published BPE
    # scheme the Scala kernel implements (graft.functions.Bpe)
    merges = [tuple(l.split()) for l in
              open("/root/repo/src/main/resources/graft/bpe_merges.txt")
              if l.strip()]
    rank = {p: i for i, p in enumerate(merges)}

    def bpe_tokens(word):
        parts = list(word)
        while len(parts) > 1:
            best = None
            for i in range(len(parts) - 1):
                r = rank.get((parts[i], parts[i + 1]))
                if r is not None and (best is None or r < best):
                    best = r
            if best is None:
                break
            pair = merges[best]
            nxt, i = [], 0
            while i < len(parts):
                if i + 1 < len(parts) and (parts[i], parts[i + 1]) == pair:
                    nxt.append(parts[i] + parts[i + 1])
                    i += 2
                else:
                    nxt.append(parts[i])
                    i += 1
            parts = nxt
        return len(parts)

    q91_rows = [(doc_id,
                 len(text.split()),
                 sum(bpe_tokens(w) for w in text.split()))
                for doc_id, text in docs]
    q91 = pa.table({
        "doc_id": pa.array([r[0] for r in q91_rows], pa.int64()),
        "ws_tokens": pa.array([r[1] for r in q91_rows], pa.int64()),
        "bpe_tokens": pa.array([r[2] for r in q91_rows], pa.int64()),
    })
    pq.write_table(q91, f"{out_dir}/q91_bpe_merge_tokens.parquet")

    print(f"golden: q12b/q22 rows={len(all_rows)}, q21 rows={len(fps)}, "
          f"q16 pairs={len(pairs)}, q70 rows={len(mmr_rows)}, "
          f"q91 rows={len(q91_rows)} -> {out_dir}")


if __name__ == "__main__":
    main()
