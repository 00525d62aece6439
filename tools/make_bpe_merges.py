#!/usr/bin/env python3
"""One-off fixture generator: train a small word-level BPE merges table
on the sf0.01 documents corpus and write it to
src/main/resources/graft/bpe_merges.txt (one "left right" pair per
line; rank = 0-based line number).

Training is the textbook Sennrich et al. 2016 loop: words are
whitespace-split, initialized as character sequences (no end-of-word
marker — the applier uses the same convention), and the most frequent
adjacent symbol pair is merged per round. Ties break by (count desc,
pair lexicographic asc) so the table is deterministic.

Driver-side tooling only; run once and commit the output:

    python3 tools/make_bpe_merges.py /root/testdata/sf0.01 256
"""
import collections
import sys

import duckdb


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    out = "src/main/resources/graft/bpe_merges.txt"

    con = duckdb.connect()
    texts = con.sql(
        f"SELECT text FROM '{sf_dir}/documents.parquet' ORDER BY doc_id"
    ).fetchall()

    word_freq = collections.Counter()
    for (text,) in texts:
        for w in text.split():
            word_freq[w] += 1
    vocab = {tuple(w): c for w, c in word_freq.items()}

    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], [-ord(ch) for ch in kv[0][0]], [-ord(ch) for ch in kv[0][1]]))
        # (count desc, pair lex asc): invert lex via negative ordinals
        pair = best[0]
        merges.append(pair)
        merged = {}
        for sym, c in vocab.items():
            out_sym = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == pair:
                    out_sym.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    out_sym.append(sym[i])
                    i += 1
            merged[tuple(out_sym)] = merged.get(tuple(out_sym), 0) + c
        vocab = merged

    with open(out, "w") as f:
        for a, b in merges:
            f.write(f"{a} {b}\n")
    print(f"{len(merges)} merges -> {out}")


if __name__ == "__main__":
    main()
