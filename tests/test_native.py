"""Native C++ codec tests: build, parity with Python fallbacks and with
PIL's canonical TIFF-LZW encoder."""
import numpy as np
import pytest

from nellie_tpu import native
from nellie_tpu.io import tiff


@pytest.fixture(scope="module")
def lib_ok():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return True


def _pil_lzw_strips(tmp_path, data):
    """Write data as an LZW TIFF with PIL and return (strips, row ranges)."""
    from PIL import Image

    path = tmp_path / "pil_lzw.tif"
    Image.fromarray(data).save(path, format="TIFF", compression="tiff_lzw")
    strips = []
    with tiff.TiffFile(path) as tf:
        page = tf.pages[0]
        assert page.compression == 5
        offs = page.tag_value(273)
        cnts = page.tag_value(279)
        offs = offs if isinstance(offs, tuple) else (offs,)
        cnts = cnts if isinstance(cnts, tuple) else (cnts,)
        rows_per_strip = int(page.tag_value(278, page.shape[0]))
        with open(path, "rb") as f:
            row = 0
            for o, c in zip(offs, cnts):
                f.seek(int(o))
                raw = f.read(int(c))
                nrows = min(rows_per_strip, page.shape[0] - row)
                strips.append((raw, data[row : row + nrows].tobytes()))
                row += nrows
    return path, strips


def test_native_builds(lib_ok):
    assert native.get_lib() is not None


def test_lzw_decoders_match_pil(lib_ok, tmp_path, rng):
    data = rng.integers(0, 16, (64, 80), dtype=np.uint8)
    path, strips = _pil_lzw_strips(tmp_path, data)
    for raw, truth in strips:
        assert tiff._lzw_decode(raw) == truth
        assert native.lzw_decode(raw, len(truth)) == truth
    # whole-file read through the reader (uses the native fast path)
    np.testing.assert_array_equal(tiff.imread(path), data)


def test_lzw_large_incompressible(lib_ok, tmp_path, rng):
    # large random data forces table resets / max code widths
    data = rng.integers(0, 256, (256, 300), dtype=np.uint8)
    path, strips = _pil_lzw_strips(tmp_path, data)
    for raw, truth in strips:
        assert native.lzw_decode(raw, len(truth)) == truth
        assert tiff._lzw_decode(raw) == truth


def test_packbits_native_matches_python(lib_ok):
    raw = bytes([0, 5, 255, 7, 254, 9, 2, 1, 2, 3])
    py = tiff._packbits_decode(raw)
    nat = native.packbits_decode(raw, len(py))
    assert nat == py


def test_undo_predictor(lib_ok):
    rows, cols = 4, 100
    original = np.random.default_rng(0).integers(0, 1000, (rows, cols)).astype(np.uint16)
    diffed = original.copy()
    diffed[:, 1:] = np.diff(original, axis=1)
    work = diffed.copy()
    assert native.undo_predictor(work)
    np.testing.assert_array_equal(work, original)


def test_decode_strips_parallel(lib_ok, tmp_path, rng):
    data = rng.integers(0, 8, (256, 128), dtype=np.uint8)
    _, strips = _pil_lzw_strips(tmp_path, data)
    encoded = [raw for raw, _ in strips]
    plain = [truth for _, truth in strips]
    src = b"".join(encoded)
    offsets = np.cumsum([0] + [len(e) for e in encoded[:-1]]).astype(np.int64)
    lengths = np.asarray([len(e) for e in encoded], np.int64)
    sizes = [len(p) for p in plain]
    dst = np.zeros(sum(sizes), np.uint8)
    dst_offsets = np.cumsum([0] + sizes[:-1]).astype(np.int64)
    dst_lengths = np.asarray(sizes, np.int64)
    ok = native.decode_strips(src, offsets, lengths, dst, dst_offsets, dst_lengths,
                              compression=5, n_threads=4)
    assert ok
    assert dst.tobytes() == b"".join(plain)
