"""CLI smoke: ARD gzip -> full pipeline -> graph tables, with resume."""

import json

import pyarrow.dataset as pads

from aisafetyintervention_literatureextraction_ray.cli import main


def _write_ard(path):
    from aisafetyintervention_literatureextraction_ray.sources.ard import (
        write_ard_jsonl,
    )

    rows = [
        {"title": f"paper {i}", "authors": ["a"],
         "date_published": "2024-01-01", "url": f"https://x/{i}",
         "abstract": None,
         "text": (f"filler {i}. reward hacking is mitigated by rlhf. "
                  "alignment requires monitoring evasion detection.")}
        for i in range(12)
    ]
    write_ard_jsonl(rows, str(path))


def test_cli_ard_to_graph_and_resume(tmp_path, capsys):
    ard = tmp_path / "corpus.jsonl.gz"
    _write_ard(ard)
    out = tmp_path / "run"

    rc = main(["--ard", str(ard), "--out", str(out),
               "--partitions", "2", "--no-dedup"])
    assert rc == 0
    result = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result["n_docs"] == 12
    assert result["n_triples"] > 0
    assert pads.dataset(out / "graph" / "nodes").count_rows() > 0
    assert pads.dataset(out / "graph" / "edges").count_rows() > 0

    # second run resumes: all partitions skipped, same triple count
    rc = main(["--ard", str(ard), "--out", str(out),
               "--partitions", "2", "--no-dedup"])
    assert rc == 0
    result2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert result2["extract"]["skipped"] == 2
    assert result2["n_triples"] == result["n_triples"]
