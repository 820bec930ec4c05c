"""Command-line entry point: run the full KG pipeline over a corpus.

Usage (a user of the reference repo switching to this engine)::

    python -m aisafetyintervention_literatureextraction_ray.cli \
        --input /data/docs_parquet --out /data/kg_run \
        --partitions 8 --canonicalize lsh

    python -m aisafetyintervention_literatureextraction_ray.cli \
        --ard /data/ard.jsonl.gz --out /data/kg_run

Input is either a directory of interleaved-doc parquet (DOCS_SCHEMA)
or ARD JSONL (the reference's source format); output is the run
directory layout of ``pipelines/full.py`` (extractions/, triples/,
graph/{nodes,edges,mentions}/, neardup_pairs/, manifest.jsonl).
Re-running with the same --out resumes from the manifest.
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="directory of DOCS_SCHEMA parquet")
    src.add_argument("--ard", help="ARD JSONL path(s), gzip-aware")
    ap.add_argument("--out", required=True, help="run directory")
    ap.add_argument("--partitions", type=int, default=4)
    ap.add_argument("--max-inflight", type=int, default=2)
    ap.add_argument("--canonicalize", default="lsh",
                    choices=["lsh", "exact", "off"])
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--no-dedup", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=None,
                    help="ray.init num_cpus (standalone runs only)")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():  # the test/driver may own the session
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")

    from .config import (
        CanonicalizationConfig,
        DedupConfig,
        PipelineConfig,
        run_with_config,
    )

    def make_partition(pid: int):
        import ray.data as rd

        if args.input:
            from .functions.hashing import stable_u64

            ds = rd.read_parquet(args.input)
        else:
            from .sources.ard import read_ard_jsonl

            ds = read_ard_jsonl(args.ard)
        # hash-slice the corpus into partitions (a pre-sharded corpus
        # would map shards to partitions instead)
        import pyarrow as pa

        def my_slice(t: pa.Table) -> pa.Table:
            import numpy as np

            from .functions.hashing import stable_u64 as h

            ids = t.column("doc_id").to_pylist()
            keep = np.fromiter((h(d) % args.partitions == pid for d in ids),
                               dtype=bool, count=len(ids))
            return t.filter(pa.array(keep))

        return ds.map_batches(my_slice, batch_format="pyarrow")

    cfg = PipelineConfig(
        num_partitions=args.partitions,
        max_inflight=args.max_inflight,
        resume=not args.no_resume,
        canonicalization=CanonicalizationConfig(
            mode=None if args.canonicalize == "off" else args.canonicalize),
        dedup=DedupConfig(enabled=not args.no_dedup),
    )
    result = run_with_config(make_partition, args.out, cfg)
    print(json.dumps(result, default=str))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
