"""CLI entry (reference api/main.py:41-57): --extract N reports the
missing number without HTTP; errors exit nonzero."""

import sys

import pytest

from python_etl_rest_api_spark.api import app as app_mod


def test_cli_extract_reports_missing(spark, monkeypatch, capsys):
    monkeypatch.setattr(sys, "argv", ["first100", "--extract", "57"])
    app_mod.main()
    out = capsys.readouterr().out
    assert "extracted: 57" in out
    assert "missing:   57" in out


def test_cli_out_of_range_exits_nonzero(spark, monkeypatch, capsys):
    monkeypatch.setattr(sys, "argv", ["first100", "--extract", "101"])
    with pytest.raises(SystemExit) as exc:
        app_mod.main()
    assert exc.value.code == 1
    assert "error" in capsys.readouterr().out


def test_build_app_gated_without_fastapi(spark):
    if app_mod.HAVE_FASTAPI:
        app = app_mod.build_app(spark)
        assert app.title == "python_etl_rest_api_spark"
    else:
        with pytest.raises(RuntimeError):
            app_mod.build_app(spark)
