"""C2 — user-script loading with the reference's naming convention
(python35_filter.cpp:447-626): import by file path, resolve the filter
method by stripping the "_script_" prefix, honor set_filter_config."""

from __future__ import annotations

import textwrap

import pytest

from foglamp_filter_python35_spark.config import FilterConfig
from tests.conftest import fix_event_ts
from foglamp_filter_python35_spark.datamodel import events_to_readings
from foglamp_filter_python35_spark.registry import (
    REGISTRY,
    TransformRegistry,
    load_filter_script,
    script_method_name,
)


def test_method_name_strips_script_prefix():
    assert script_method_name("/x/y/abc123_script_myfilter.py") == "myfilter"
    # rfind semantics: the LAST marker wins (python35_filter.cpp:460)
    assert script_method_name("a_script_b_script_c.py") == "c"
    # no marker -> empty method -> the filter is force-disabled
    assert script_method_name("readings35.py") == ""


def test_markerless_script_registers_disabled_passthrough(spark, tmp_path):
    """Reference parity: a script file without '_script_' in its name
    disables the filter (pass-through) instead of resolving a method —
    and the module is never imported (a poison import proves it)."""
    script = tmp_path / "nomarker.py"
    script.write_text("raise RuntimeError('must never be imported')\n")
    reg = TransformRegistry()
    name = load_filter_script(str(script), reg)
    assert name == "nomarker"
    readings = _events_readings(spark).limit(5)
    stage = reg.stage(name, FilterConfig(name, enable=True))
    out = stage.fn(readings, stage.config)
    assert out.collect() == readings.collect()


def _events_readings(spark):
    import pyspark.sql.functions as F

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev = fix_event_ts(ev)
    return events_to_readings(ev)


def test_loaded_script_runs_as_stage(spark, tmp_path):
    # the readings35.py shape: add 100 to every numeric datapoint
    script = tmp_path / "e5f6_script_add100.py"
    script.write_text(
        textwrap.dedent(
            """
            _config = {}

            def set_filter_config(configuration):
                global _config
                _config = configuration
                return True

            def add100(readings):
                for r in readings:
                    for k, v in list(r["reading"].items()):
                        if isinstance(v, (int, float)):
                            r["reading"][k] = v + 100
                return readings
            """
        )
    )
    reg = TransformRegistry()
    name = load_filter_script(str(script), reg)
    assert name == "add100"

    readings = _events_readings(spark).limit(50)
    before = {r["id"]: r["reading"]["value"] for r in readings.collect()}
    stage = reg.stage(name, FilterConfig(name, enable=True))
    out = stage.fn(readings, stage.config)
    after = {r["id"]: r["reading"]["value"] for r in out.collect()}
    assert after == {i: v + 100 for i, v in before.items()}


def test_missing_method_aborts_registration(tmp_path):
    bad = tmp_path / "q_script_nosuch.py"
    bad.write_text("x = 1\n")
    with pytest.raises(AttributeError, match="nosuch"):
        load_filter_script(str(bad), TransformRegistry())


def test_missing_file_aborts(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_filter_script(str(tmp_path / "absent.py"), TransformRegistry())


def test_set_filter_config_must_return_true(spark, tmp_path):
    script = tmp_path / "r_script_badcfg.py"
    script.write_text(
        textwrap.dedent(
            """
            def set_filter_config(configuration):
                return False

            def badcfg(readings):
                return readings
            """
        )
    )
    reg = TransformRegistry()
    name = load_filter_script(str(script), reg)
    readings = _events_readings(spark).limit(5)
    stage = reg.stage(name, FilterConfig(name, enable=True))
    with pytest.raises(ValueError, match="set_filter_config"):
        stage.fn(readings, stage.config)


def test_default_registry_is_default_target(tmp_path):
    script = tmp_path / "z_script_identity_loaded.py"
    script.write_text("def identity_loaded(readings):\n    return readings\n")
    name = load_filter_script(str(script))
    assert name in REGISTRY.names()
