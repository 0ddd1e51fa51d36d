"""Filter-config layer tests: scanner, parser, compiler, resolution."""

import os

import numpy as np
import pytest

from folve_tpu.audio import SampleCodec, write_wav
from folve_tpu.filters import (
    CopyOp,
    DiracOp,
    FilterCompileError,
    HilbertOp,
    ReadOp,
    ZitaConfigError,
    compile_config_file,
    compile_spec,
    list_config_dirs,
    parse_config,
    resolve_filter_config,
    sanitize_config_subdir,
    sstring,
)


# ---------------------------------------------------------------- sstring
class TestSstring:
    def test_plain(self):
        assert sstring("hello world") == ("hello", 5)

    def test_leading_blanks_and_tabs(self):
        tok, n = sstring(" \t foo.wav\n")
        assert tok == "foo.wav"

    def test_double_quotes_with_spaces(self):
        tok, n = sstring('"my file.wav" rest')
        assert tok == "my file.wav"

    def test_single_quotes_keep_backslash(self):
        tok, _ = sstring(r"'a\b'")
        assert tok == r"a\b"

    def test_escape_outside_quotes(self):
        tok, _ = sstring(r"a\ b")
        assert tok == "a b"

    def test_unterminated_quote_is_error(self):
        assert sstring('"abc') == (None, 0)

    def test_quote_mid_token_is_error(self):
        assert sstring('ab"cd"') == (None, 0)

    def test_empty(self):
        tok, n = sstring("   ")
        assert tok == "" and n == 3


# ----------------------------------------------------------------- parser
LOWPASS_CONF = """\
# comment line

/convolver/new    2    2        1024        65536
/impulse/read    1   1  0.75    0      0       0       1     lowpass.wav
/impulse/read    2   2  0.75    0      0       0       1     lowpass.wav
"""


class TestParser:
    def test_basic(self, tmp_path):
        p = tmp_path / "filter-44100.conf"
        p.write_text(LOWPASS_CONF)
        spec = parse_config(str(p))
        assert spec.convolver.ninp == 2
        assert spec.convolver.size == 65536
        assert len(spec.ops) == 2
        op = spec.ops[0]
        assert isinstance(op, ReadOp)
        assert op.gain == 0.75 and op.channel == 1
        assert op.path == str(tmp_path / "lowpass.wav")

    def test_dirac_and_density(self, tmp_path):
        p = tmp_path / "c.conf"
        p.write_text(
            "/convolver/new 2 2 256 204800 0.5\n"
            "/impulse/dirac 1 1 0.7 0\n"
            "/impulse/dirac 1 1 0.3 22050\n"
        )
        spec = parse_config(str(p))
        assert spec.convolver.density == 0.5
        assert [op.delay for op in spec.ops] == [0, 22050]

    def test_scientific_gain(self, tmp_path):
        p = tmp_path / "c.conf"
        p.write_text("/convolver/new 2 2 256 1024\n/impulse/dirac 1 1 4e-3 500\n")
        spec = parse_config(str(p))
        assert spec.ops[0].gain == pytest.approx(4e-3)

    def test_syntax_error(self, tmp_path):
        p = tmp_path / "c.conf"
        p.write_text("bogus line\n")
        with pytest.raises(ZitaConfigError):
            parse_config(str(p))

    def test_unknown_command(self, tmp_path):
        p = tmp_path / "c.conf"
        p.write_text("/frobnicate 1 2\n")
        with pytest.raises(ZitaConfigError):
            parse_config(str(p))

    def test_impulse_before_convolver(self, tmp_path):
        p = tmp_path / "c.conf"
        p.write_text("/impulse/dirac 1 1 1.0 0\n")
        with pytest.raises(ZitaConfigError):
            parse_config(str(p))

    def test_bad_io_number(self, tmp_path):
        p = tmp_path / "c.conf"
        p.write_text("/convolver/new 2 2 256 1024\n/impulse/dirac 3 1 1.0 0\n")
        with pytest.raises(ZitaConfigError):
            parse_config(str(p))

    def test_other_error_aborts_but_succeeds(self, tmp_path):
        # ERR_OTHER quirk: out-of-range channel count stops parsing but
        # the parse reports success (zita-config.cc:345).
        p = tmp_path / "c.conf"
        p.write_text("/convolver/new 100 2 256 1024\n/impulse/dirac 1 1 1.0 0\n")
        spec = parse_config(str(p))
        assert spec.convolver is None
        assert spec.ops == []
        assert any("out of range" in w for w in spec.warnings)

    def test_cd_relative(self, tmp_path):
        sub = tmp_path / "irs"
        sub.mkdir()
        p = tmp_path / "c.conf"
        p.write_text(
            "/convolver/new 1 1 256 1024\n"
            "/cd irs\n"
            "/impulse/read 1 1 1.0 0 0 0 1 x.wav\n"
        )
        spec = parse_config(str(p))
        assert spec.ops[0].path == str(tmp_path / "irs" / "x.wav")

    def test_copy_and_hilbert(self, tmp_path):
        p = tmp_path / "c.conf"
        p.write_text(
            "/convolver/new 2 2 256 70000\n"
            "/impulse/hilbert 1 1 1.0 4096 128\n"
            "/impulse/copy 2 2 1 1\n"
            "/input/name left\n/output/name out_l\n"
        )
        spec = parse_config(str(p))
        assert isinstance(spec.ops[0], HilbertOp)
        assert isinstance(spec.ops[1], CopyOp)
        assert (spec.ops[1].src_inp, spec.ops[1].dst_inp) == (1, 2)

    def test_copy_same_pair_fatal(self, tmp_path):
        p = tmp_path / "c.conf"
        p.write_text("/convolver/new 2 2 256 1024\n/impulse/copy 1 1 1 1\n")
        with pytest.raises(ZitaConfigError):
            parse_config(str(p))


# --------------------------------------------------------------- compiler
class TestCompiler:
    def test_dirac_compile(self, tmp_path):
        p = tmp_path / "c.conf"
        p.write_text(
            "/convolver/new 2 2 256 1024\n"
            "/impulse/dirac 1 1 0.7 0\n"
            "/impulse/dirac 1 1 0.3 100\n"
            "/impulse/dirac 2 2 1.0 0\n"
        )
        cf = compile_config_file(str(p), fsamp=44100)
        assert cf.ir.shape == (2, 2, 1024)
        assert cf.ir[0, 0, 0] == pytest.approx(0.7)
        assert cf.ir[0, 0, 100] == pytest.approx(0.3)
        assert cf.ir[1, 1, 0] == pytest.approx(1.0)
        assert np.all(cf.ir[0, 1] == 0)

    def test_read_with_windowing(self, tmp_path, rng):
        ir_data = rng.standard_normal((500, 2)).astype(np.float32)
        write_wav(str(tmp_path / "ir.wav"), ir_data, 44100, SampleCodec.FLOAT)
        p = tmp_path / "c.conf"
        p.write_text(
            "/convolver/new 1 1 256 1024\n"
            "/impulse/read 1 1 2.0 10 50 100 2 ir.wav\n"
        )
        cf = compile_config_file(str(p), fsamp=44100)
        expected = np.zeros(1024)
        expected[10:110] = 2.0 * ir_data[50:150, 1]
        np.testing.assert_allclose(cf.ir[0, 0], expected, atol=1e-6)

    def test_read_truncation_warning(self, tmp_path, rng):
        ir_data = rng.standard_normal((2000, 1)).astype(np.float32)
        write_wav(str(tmp_path / "ir.wav"), ir_data, 44100, SampleCodec.FLOAT)
        p = tmp_path / "c.conf"
        p.write_text("/convolver/new 1 1 256 1000\n/impulse/read 1 1 1.0 0 0 0 1 ir.wav\n")
        cf = compile_config_file(str(p), fsamp=44100)
        assert any("truncated" in w.lower() for w in cf.warnings)
        np.testing.assert_allclose(cf.ir[0, 0], ir_data[:1000, 0], atol=1e-6)

    def test_rate_mismatch_warns_not_fatal(self, tmp_path, rng):
        write_wav(str(tmp_path / "ir.wav"), rng.standard_normal(64).astype(np.float32), 48000)
        p = tmp_path / "c.conf"
        p.write_text("/convolver/new 1 1 64 128\n/impulse/read 1 1 1.0 0 0 0 1 ir.wav\n")
        cf = compile_config_file(str(p), fsamp=44100)
        assert any("does not match" in w for w in cf.warnings)

    def test_missing_ir_file_partial_success(self, tmp_path):
        p = tmp_path / "c.conf"
        p.write_text(
            "/convolver/new 1 1 64 128\n"
            "/impulse/dirac 1 1 0.5 0\n"
            "/impulse/read 1 1 1.0 0 0 0 1 nope.wav\n"
            "/impulse/dirac 1 1 0.9 1\n"
        )
        cf = compile_config_file(str(p), fsamp=44100)
        # dirac before the failing read survives; one after is dropped.
        assert cf.ir[0, 0, 0] == pytest.approx(0.5)
        assert cf.ir[0, 0, 1] == 0.0

    def test_no_convolver_is_fatal(self, tmp_path):
        p = tmp_path / "c.conf"
        p.write_text("# nothing\n")
        with pytest.raises(FilterCompileError):
            compile_config_file(str(p), fsamp=44100)

    def test_hilbert_antisymmetric(self, tmp_path):
        p = tmp_path / "c.conf"
        p.write_text("/convolver/new 1 1 256 1024\n/impulse/hilbert 1 1 1.0 128 256\n")
        cf = compile_config_file(str(p), fsamp=44100)
        h = 128
        ir = cf.ir[0, 0]
        # delay'= 128 - 256/2 = 0; kernel occupies [0, 256)
        assert ir[h] == 0.0
        i = np.arange(1, h, 2)
        np.testing.assert_allclose(ir[h + i], -ir[h - i], atol=1e-7)
        assert ir[h + 1] < 0 < ir[h - 1]

    def test_copy_accumulates_snapshot(self, tmp_path):
        p = tmp_path / "c.conf"
        p.write_text(
            "/convolver/new 2 2 64 128\n"
            "/impulse/dirac 1 1 0.5 3\n"
            "/impulse/copy 2 2 1 1\n"
        )
        cf = compile_config_file(str(p), fsamp=44100)
        assert cf.ir[1, 1, 3] == pytest.approx(0.5)


# -------------------------------------------------------------- resolution
class TestResolve:
    def test_most_specific_first(self, tmp_path):
        for name in [
            "filter-44100.conf",
            "filter-44100-2.conf",
            "filter-44100-2-16.conf",
            "filter-48000.conf",
        ]:
            (tmp_path / name).write_text("#\n")
        d = str(tmp_path)
        assert resolve_filter_config(d, 44100, 2, 16).endswith("filter-44100-2-16.conf")
        assert resolve_filter_config(d, 44100, 2, 24).endswith("filter-44100-2.conf")
        assert resolve_filter_config(d, 44100, 6, 24).endswith("filter-44100.conf")
        assert resolve_filter_config(d, 48000, 2, 16).endswith("filter-48000.conf")
        assert resolve_filter_config(d, 96000, 2, 16) is None

    def test_list_config_dirs(self, tmp_path):
        (tmp_path / "lowpass").mkdir()
        (tmp_path / "highpass").mkdir()
        (tmp_path / "somefile.txt").write_text("x")
        got = list_config_dirs(str(tmp_path))
        assert got == {"", "lowpass", "highpass"}

    def test_sanitize_escape(self, tmp_path):
        base = tmp_path / "filters"
        base.mkdir()
        (base / "ok").mkdir()
        (tmp_path / "outside").mkdir()
        assert sanitize_config_subdir(str(base), "ok") == "ok"
        assert sanitize_config_subdir(str(base), "../outside") is None
        assert sanitize_config_subdir(str(base), "ok/../ok") == "ok"
        assert sanitize_config_subdir(str(base), ".") == ""
        assert sanitize_config_subdir(str(base), "missing") is None


# ------------------------------------------------------------ demo filters
def test_demo_filters_compile(tmp_path):
    from folve_tpu.tools.make_demo_filters import make_echo, make_lowpass

    make_lowpass(str(tmp_path), rates=(44100,))
    make_echo(str(tmp_path), rates=(44100,))
    conf = resolve_filter_config(str(tmp_path / "lowpass"), 44100, 2, 16)
    cf = compile_config_file(conf, fsamp=44100)
    assert cf.bank.ninp == 2 and cf.bank.nout == 2
    # lowpass: DC gain ~ 0.75
    assert abs(np.sum(cf.ir[0, 0]) - 0.75) < 0.01
    conf = resolve_filter_config(str(tmp_path / "echo"), 44100, 2, 16)
    cf = compile_config_file(conf, fsamp=44100)
    assert cf.ir[0, 0, 0] == pytest.approx(0.7)
    assert cf.ir[0, 0, 22050] == pytest.approx(0.3)


def test_ambisonic_bformat_ir_tagging(tmp_path):
    """A WAVEX ambisonic B-format IR marks the compiled filter
    (reference: Audiofile TYPE_AMB via SFC_WAVEX_GET_AMBISONIC,
    zita-audiofile.cc:72-73,147-149)."""
    import ctypes

    import numpy as np

    from tests.test_extra_formats import _sf
    from folve_tpu.audio import read_audio
    from folve_tpu.filters.compiler import compile_config_file

    lib = _sf()
    rng = np.random.default_rng(0)
    x = (0.1 * rng.standard_normal((256, 4))).astype(np.float32)
    irp = tmp_path / "bformat.wav"
    info = lib.SfInfo()
    info.samplerate, info.channels, info.format = 44100, 4, 0x130002
    snd = lib.sf_open(str(irp).encode(), 0x20, ctypes.byref(info))
    lib.sf_command.argtypes = [ctypes.c_void_p, ctypes.c_int,
                               ctypes.c_void_p, ctypes.c_int]
    assert lib.sf_command(snd, 0x1200, None, 0x41) == 0x41  # SET_AMBISONIC
    lib.sf_writef_float(snd, x.ctypes.data, 256)
    lib.sf_close(snd)
    _, ai = read_audio(str(irp))
    assert ai.ambisonic

    conf = tmp_path / "filter-44100.conf"
    conf.write_text(
        "/convolver/new 1 1 64 512\n"
        f"/impulse/read 1 1 1.0 0 0 0 1 {irp}\n"
    )
    cf = compile_config_file(str(conf), 44100)
    assert cf.ambisonic

    # A plain (non-B-format) IR does not set the flag.
    irp2 = tmp_path / "plain.wav"
    info2 = lib.SfInfo()
    info2.samplerate, info2.channels, info2.format = 44100, 4, 0x130002
    snd = lib.sf_open(str(irp2).encode(), 0x20, ctypes.byref(info2))
    lib.sf_writef_float(snd, x.ctypes.data, 256)
    lib.sf_close(snd)
    conf2 = tmp_path / "filter2-44100.conf"
    conf2.write_text(
        "/convolver/new 1 1 64 512\n"
        f"/impulse/read 1 1 1.0 0 0 0 1 {irp2}\n"
    )
    cf2 = compile_config_file(str(conf2), 44100)
    assert not cf2.ambisonic
