"""Driver contract for the Ray-Data KG-construction engine.

The driver calls ``ray.init`` itself before importing this module; no
function here (or in the library) initialises or shuts down Ray.

* ``entry()``      — flagship pipeline on /root/testdata/sf0.001:
  interleave the documents table into the input_hint doc shape, run
  extraction -> triples.
* ``queries()``    — one callable per implemented operator (SURVEY.md §2
  + the large-scale dedup/similarity/text-analysis additions).
* ``oracle_sql()`` — DuckDB-equivalent SQL for the SQL-expressible ones.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: sf0.001 documents -> interleaved docs -> triples."""
    from aisafetyintervention_literatureextraction_ray.pipelines.extraction import (
        extract_pipeline,
        triples_from_extractions,
    )
    from aisafetyintervention_literatureextraction_ray.sources.docs import (
        interleave_from_documents,
    )

    docs = interleave_from_documents("/root/testdata/sf0.001")
    extractions = extract_pipeline(docs, concurrency=(1, 4), batch_size=128)
    return triples_from_extractions(extractions)


def queries() -> dict[str, Callable[[str], Any]]:
    from aisafetyintervention_literatureextraction_ray import driver_queries

    return driver_queries.QUERIES


def oracle_sql() -> dict[str, str]:
    from aisafetyintervention_literatureextraction_ray import driver_queries

    # The kg_* / canon / ivf oracles read flat artifacts from parquet
    # paths the corresponding queries materialize.  Materialize for the
    # driver's correctness sf here as well (GRAFT_ORACLE_SF_DIR
    # overrides; default = the driver's documented sf0.01), so the
    # oracles are valid regardless of whether the driver evaluates SQL
    # before or after the Ray queries.  Best-effort — but LOUD on
    # failure: a silently skipped materialization turns into an opaque
    # oracle error later (ADVICE r2).
    import logging
    import os

    log = logging.getLogger(__name__)
    try:
        import ray

        sf_dir = os.environ.get("GRAFT_ORACLE_SF_DIR",
                                "/root/testdata/sf0.01")
        if not ray.is_initialized():
            log.warning(
                "oracle_sql(): Ray is not initialized — skipping oracle "
                "input materialization; kg_*/canon/ivf oracles will only "
                "be valid after their queries run first")
        elif not os.path.isdir(sf_dir):
            log.warning("oracle_sql(): %s missing — skipping oracle "
                        "input materialization", sf_dir)
        else:
            driver_queries._materialize_kg_inputs(sf_dir)
            driver_queries.ensure_canon_accepted(sf_dir)
            driver_queries.materialize_ivf_oracle(sf_dir)
            driver_queries._materialize_media_inventory(sf_dir)
            driver_queries.materialize_semdedup_oracle(sf_dir)
            driver_queries.materialize_parity_oracle(sf_dir)
    except Exception:
        log.warning("oracle_sql(): oracle input materialization failed; "
                    "dependent oracles may error", exc_info=True)
    return driver_queries.ORACLE_SQL
