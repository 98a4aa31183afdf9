"""Capture the UNcheckpointed ngram pair plan (eager=False) so the
Exchange/join structure is visible (the query-level capture is hidden
behind the localCheckpoint boundary), and optionally collect the result
for before/after value comparison.

Usage: python scripts/r16_probe_ngram.py <tag> [--collect]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from neurondb_spark.operators.dedup import (  # noqa: E402
    ngram_containment_pairs,
    ngram_jaccard_pairs,
)
from neurondb_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    collect = "--collect" in sys.argv
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r16",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("neurondb-r16-ngram-probe")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    frames = {
        "ngram_jaccard_pairs_inner": ngram_jaccard_pairs(
            docs, "text", "doc_id", threshold=0.03, shingle_n=3,
            block_col="lang", max_df=20, eager=False,
        ),
        "ngram_containment_pairs_inner": ngram_containment_pairs(
            docs, "text", "doc_id", threshold=0.12, shingle_n=3,
            block_col="lang", max_df=20, eager=False,
        ),
    }
    for name, df in frames.items():
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        n_ex = buf.getvalue().count("Exchange")
        n_smj = buf.getvalue().count("SortMergeJoin")
        print(f"wrote {path}  Exchange={n_ex} SortMergeJoin={n_smj}")
        if collect:
            rows = sorted(
                (r[0], r[1], round(r[2], 9)) for r in df.collect()
            )
            import hashlib
            import json

            h = hashlib.sha256(
                json.dumps(rows, sort_keys=True).encode()
            ).hexdigest()[:16]
            print(f"{name}: rows={len(rows)} hash={h}")


if __name__ == "__main__":
    main()
