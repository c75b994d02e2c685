"""End-to-end CLI entry points (reference parity: cli_pynb_log_parser
and cli_generate_static_data argument surfaces + output files)."""

import io
import json
import zipfile

import pytest

from composable_logs_spark import cli
from composable_logs_spark.spanlog import fixtures as FX


@pytest.fixture(autouse=True)
def _reuse_session(spark, monkeypatch):
    monkeypatch.setattr(cli, "_spark", lambda: spark)


def test_pynb_log_parser_cli(spark, tmp_path):
    span_file = tmp_path / "spans.json"
    span_file.write_text(json.dumps(FX.logged_values_fixture(4)))
    out_dir = tmp_path / "out"
    dag = tmp_path / "mmd" / "dag.mmd"
    gantt = tmp_path / "mmd" / "gantt.mmd"

    rc = cli.pynb_log_parser(
        [
            "--input_span_file", str(span_file),
            "--output_directory", str(out_dir),
            "--output_filepath_mermaid_dag", str(dag),
            "--output_filepath_mermaid_gantt", str(gantt),
        ]
    )
    assert rc == 0
    # reference directory layout (single run at the base)
    assert (out_dir / "run-time-metadata.json").exists()
    assert len(list(out_dir.glob("python-task--*"))) == 3
    assert len(list(out_dir.glob("*/artifacts/plot.png"))) == 1
    # mermaid outputs incl. the -nolinks variant next to dag.mmd
    assert dag.read_text().startswith("graph LR")
    nolinks = dag.with_name("dag-nolinks.mmd")
    assert nolinks.exists() and "<a href" not in nolinks.read_text()
    assert gantt.read_text().startswith("gantt")


def test_pynb_log_parser_rejects_bad_dag_suffix(spark, tmp_path):
    span_file = tmp_path / "spans.json"
    span_file.write_text(json.dumps(FX.compose3(0)))
    with pytest.raises(SystemExit):
        cli.pynb_log_parser(
            [
                "--input_span_file", str(span_file),
                "--output_filepath_mermaid_dag", str(tmp_path / "dag.txt"),
            ]
        )


def test_generate_static_data_cli(spark, tmp_path):
    zdir = tmp_path / "zips"
    zdir.mkdir()
    for i, fixture in enumerate([FX.compose3(0), FX.parallel_fail(1)]):
        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("opentelemetry-spans.json", json.dumps(fixture))
        (zdir / f"run{i}.zip").write_bytes(buf.getvalue())
    www = tmp_path / "www"

    rc = cli.generate_static_data(
        ["--zip_cache_dir", str(zdir), "--output_www_root_directory", str(www)]
    )
    assert rc == 0
    data = json.loads((www / "static_data.json").read_text())
    assert len(data) == 8  # 2 workflows + 6 tasks
    assert {e["type"] for e in data} == {"workflow", "task"}
    # per-run reporting artifacts under the multi-run layout
    assert len(list(www.glob("*/artifacts/workflow/*/dag.mmd"))) == 2


def test_generate_static_data_cli_no_input(spark, tmp_path):
    rc = cli.generate_static_data(
        ["--output_www_root_directory", str(tmp_path / "www")]
    )
    assert rc == 1


def test_packaging_console_scripts_resolve():
    """pyproject.toml ships the same two console scripts the reference's
    setup.py installs; each declared entry point must resolve to a
    callable (a `pip install -e .` smoke without needing pip in-test)."""
    import importlib
    import pathlib
    import tomllib

    data = tomllib.loads(
        pathlib.Path(__file__).resolve().parents[1].joinpath("pyproject.toml").read_text()
    )
    scripts = data["project"]["scripts"]
    assert set(scripts) == {"pynb_log_parser", "generate_static_data"}
    for target in scripts.values():
        mod, fn = target.split(":")
        assert callable(getattr(importlib.import_module(mod), fn))
