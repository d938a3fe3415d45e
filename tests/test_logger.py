"""Logger parity: custom levels, locale number formatting, JSON logging
(reference: Logger.py:12-94)."""

import logging

from barcoder_tpu.utils.logger import HELP, SUBPROC, Logger


def test_levels_registered():
    log = Logger()
    assert logging.getLevelName(SUBPROC) == "SUBPROC"
    assert logging.getLevelName(HELP) == "HELP"
    assert SUBPROC == 25 and HELP == 15


def test_format_numbers_tokens():
    log = Logger()
    out = log.format_numbers("processed 1234567 reads in 2 files")
    # some locale-formatted representation of the number appears
    assert "reads" in out and "files" in out
    assert "1234567" not in out or "," in out or "." in out


def test_format_numbers_int():
    log = Logger()
    out = log.format_numbers(1234567)
    assert isinstance(out, str)


def test_log_methods_do_not_raise():
    log = Logger()
    records = []

    class Capture(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    handler = Capture(level=logging.DEBUG)
    log.logger.addHandler(handler)
    try:
        log.info("hello 42")
        log.warn("warn")
        log.error("err")
        log.debug("dbg")
        log.subproc("")
        log.help("")
        log.json({"a": 1})
    finally:
        log.logger.removeHandler(handler)
    assert any("hello" in m for m in records)
    assert any("No errors reported" in m for m in records)
    assert any("No help available" in m for m in records)


class TestCompileStats:
    def test_counts_backend_compiles(self):
        import jax
        import jax.numpy as jnp

        from barcoder_tpu.utils.profiling import compile_stats

        cs = compile_stats()
        pre = cs.snapshot()
        jax.jit(lambda x: x * 3 + 1)(jnp.arange(7))
        d = cs.delta(pre)
        assert d["compiles"] >= 1
        assert d["compile_s"] > 0
        # second call: cached executable, no new compile
        pre2 = cs.snapshot()
        jax.jit(lambda x: x * 3 + 1)(jnp.arange(7))
        assert compile_stats() is cs  # singleton


def test_fallback_grouping_exact(monkeypatch):
    """The no-babel fallback (the default-install path: babel is not a
    declared dependency) must group digits EXACTLY — '{:,g}' rendered
    integers >= 1e6 in scientific notation and rounded decimals to 6
    significant digits (r5 review)."""
    import barcoder_tpu.utils.logger as lg

    monkeypatch.setattr(lg, "_HAVE_BABEL", False)
    log = Logger()
    assert log.format_numbers("processed 1234567 reads") == "processed 1,234,567 reads"
    assert log.format_numbers("rate 1234.56789") == "rate 1,234.56789"
    assert log.format_numbers("delta -4200 units") == "delta -4,200 units"
    assert log.format_numbers(1234567) == "1,234,567"
    # sci-notation tokens stay numeric, no crash
    assert "e" in log.format_numbers("x 1.2e9 y").split()[1] or "," in log.format_numbers("x 1.2e9 y")
