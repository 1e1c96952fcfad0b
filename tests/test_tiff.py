"""Round-trip tests for the self-contained TIFF/OME codec."""
import numpy as np
import pytest

from nellie_tpu.io import ome as ome_mod
from nellie_tpu.io import tiff


@pytest.mark.parametrize("dtype", ["uint8", "uint16", "int32", "float32", "float64"])
def test_imwrite_imread_roundtrip_2d(tmp_path, dtype, rng):
    data = (rng.random((33, 47)) * 100).astype(dtype)
    path = tmp_path / "im.ome.tif"
    tiff.imwrite(path, data, metadata={"axes": "YX"})
    back = tiff.imread(path)
    assert back.dtype == np.dtype(dtype)
    np.testing.assert_array_equal(back, data)


def test_imwrite_imread_roundtrip_4d(tmp_path, rng):
    data = (rng.random((3, 4, 16, 17)) * 1000).astype(np.uint16)
    path = tmp_path / "im.ome.tif"
    tiff.imwrite(path, data, metadata={"axes": "TZYX"})
    with tiff.TiffFile(path) as tif:
        assert tif.is_ome
        series = tif.series[0]
        assert series.axes == "TZYX"
        assert tuple(series.shape) == data.shape
    np.testing.assert_array_equal(tiff.imread(path), data)


def test_memmap_read_write(tmp_path, rng):
    data = rng.random((2, 8, 9)).astype(np.float32)
    path = tmp_path / "im.ome.tif"
    tiff.imwrite(path, data, metadata={"axes": "TYX"})
    mm = tiff.memmap(path)
    np.testing.assert_array_equal(np.asarray(mm), data)
    mm[1, 0, 0] = 42.0
    mm.flush()
    del mm
    assert tiff.imread(path)[1, 0, 0] == 42.0


def test_allocate_empty_then_fill(tmp_path, rng):
    path = tmp_path / "empty.ome.tif"
    tiff.imwrite(path, shape=(5, 10, 11), dtype="float32", metadata={"axes": "TYX"})
    mm = tiff.memmap(path)
    assert mm.shape == (5, 10, 11)
    np.testing.assert_array_equal(np.asarray(mm), 0.0)
    frame = rng.random((10, 11)).astype(np.float32)
    mm[3] = frame
    mm.flush()
    del mm
    np.testing.assert_array_equal(tiff.imread(path)[3], frame)


def test_tiffcomment_roundtrip_and_grow(tmp_path):
    data = np.zeros((4, 5), dtype=np.uint8)
    path = tmp_path / "im.ome.tif"
    tiff.imwrite(path, data, metadata={"axes": "YX"})
    original = tiff.tiffcomment(path)
    assert "<OME" in original

    # in-place rewrite (fits in the reserved area)
    tiff.tiffcomment(path, "short comment")
    assert tiff.tiffcomment(path) == "short comment"
    np.testing.assert_array_equal(tiff.imread(path), data)

    # grow beyond reserved capacity -> relocation to EOF
    big = "x" * 200_000
    tiff.tiffcomment(path, big)
    assert tiff.tiffcomment(path) == big
    np.testing.assert_array_equal(tiff.imread(path), data)


def test_ome_xml_roundtrip():
    xml = ome_mod.build_ome_xml(
        "TZYX", (3, 4, 16, 17), "uint16",
        dim_res={"X": 0.1, "Y": 0.1, "Z": 0.5, "T": 2.5},
        description="hello world",
    )
    ome = ome_mod.from_xml(xml)
    px = ome.images[0].pixels
    assert px.size_t == 3 and px.size_z == 4 and px.size_y == 16 and px.size_x == 17
    assert px.physical_size_x == pytest.approx(0.1)
    assert px.physical_size_z == pytest.approx(0.5)
    assert px.time_increment == pytest.approx(2.5)
    assert px.type == "uint16"
    assert ome.images[0].description == "hello world"

    # mutate and re-serialise (the reference's tiffcomment rewrite path)
    px.physical_size_x = 0.25
    px.type = "float"
    ome2 = ome_mod.from_xml(ome.to_xml())
    assert ome2.images[0].pixels.physical_size_x == pytest.approx(0.25)
    assert ome_mod.numpy_dtype_name(ome2.images[0].pixels.type) == "float32"


def test_imagej_metadata_detection(tmp_path):
    data = np.zeros((6, 4, 5), dtype=np.uint16)
    desc = "ImageJ=1.53\nimages=6\nslices=6\nspacing=0.5\nunit=micron\nfinterval=2.0\n"
    path = tmp_path / "ij.tif"
    tiff.imwrite(path, data, description=desc)
    with tiff.TiffFile(path) as tif:
        assert tif.is_imagej
        meta = tif.imagej_metadata
        assert meta["slices"] == 6
        assert meta["spacing"] == 0.5
        assert meta["finterval"] == 2.0
        assert tif.series[0].axes == "ZYX"


def test_packbits_and_deflate_decode():
    # synthetic strip decoding sanity
    raw = bytes([0, 5, 255, 7])  # literal(1)=5, repeat(2)=7
    assert tiff._packbits_decode(raw) == bytes([5, 7, 7])
    import zlib

    payload = bytes(range(100))
    assert tiff._decompress(zlib.compress(payload), 8) == payload


def test_big_endian_classic_tiff(tmp_path, rng):
    """Hand-built MM (big-endian) classic TIFF, uncompressed."""
    import struct

    data = rng.integers(0, 60000, (10, 12), dtype=np.uint16)
    payload = data.astype(">u2").tobytes()
    entries = [
        (256, 3, 1, 12), (257, 3, 1, 10), (258, 3, 1, 16), (259, 3, 1, 1),
        (262, 3, 1, 1), (273, 4, 1, 8 + 2 + 12 * 9 + 4), (277, 3, 1, 1),
        (278, 4, 1, 10), (279, 4, 1, len(payload)),
    ]
    buf = b"MM" + struct.pack(">HI", 42, 8)
    buf += struct.pack(">H", len(entries))
    for code, ttype, count, value in entries:
        if ttype == 3:  # SHORT values sit left-aligned in the 4-byte slot
            buf += struct.pack(">HHIHH", code, ttype, count, value, 0)
        else:
            buf += struct.pack(">HHII", code, ttype, count, value)
    buf += struct.pack(">I", 0)
    buf += payload
    path = tmp_path / "be.tif"
    path.write_bytes(buf)

    back = tiff.imread(path)
    np.testing.assert_array_equal(back.astype(np.uint16), data)


def test_tiny_description_roundtrip(tmp_path):
    data = np.zeros((4, 5), np.uint8)
    path = tmp_path / "tiny.tif"
    tiff.imwrite(path, data, description="hi")
    assert tiff.tiffcomment(path).rstrip("\x00") == "hi"
    np.testing.assert_array_equal(tiff.imread(path), data)


def test_tiffcomment_shrink_to_inline_size(tmp_path):
    """Replacing an out-of-line description with a <=8-byte comment must
    not leave readers interpreting the stale offset bytes as inline data
    (count <= inline threshold => value slot read as data)."""
    data = np.arange(20, dtype=np.uint8).reshape(4, 5)
    path = tmp_path / "im.ome.tif"
    tiff.imwrite(path, data, metadata={"axes": "YX"})
    tiff.tiffcomment(path, "hi")
    assert tiff.tiffcomment(path).rstrip("\x00") == "hi"
    np.testing.assert_array_equal(tiff.imread(path), data)


def test_imwrite_rejects_empty_shape(tmp_path):
    """A zero-extent array would produce a header pointing at no IFD."""
    with pytest.raises(ValueError):
        tiff.imwrite(tmp_path / "z.tif", np.empty((0, 4, 4), np.uint8))
    with pytest.raises(NotImplementedError):
        tiff.imwrite(tmp_path / "c.tif", np.zeros((4, 4), np.uint8),
                     bigtiff=False)


def test_default_axes_covers_deep_stacks():
    """The axes string must always cover ndim, or build_ome_xml's zip
    mis-pairs Y/X with the wrong dimensions."""
    assert tiff._default_axes((4, 5)) == "YX"
    assert tiff._default_axes((2, 4, 5)) == "QYX"
    assert tiff._default_axes((2, 3, 4, 4, 5)) == "QTZYX"
    assert tiff._default_axes((2, 3, 4, 5, 4, 5)) == "QQTZYX"


def test_imagej_truncated_hyperstack(tmp_path, rng):
    """ImageJ truncated / raw big-stack layout: ONE IFD, frames=N, all
    frames contiguous after the first page's data — must read as the
    full stack, not silently as a single frame."""
    frames = (rng.random((3, 4, 5)) * 1000).astype(np.uint16)
    path = tmp_path / "trunc.tif"
    desc = "ImageJ=1.53\nimages=3\nframes=3\n"
    tiff.imwrite(path, frames[0], description=desc)
    with open(path, "ab") as fh:
        fh.write(frames[1:].tobytes())

    with tiff.TiffFile(path) as tif:
        s = tif.series[0]
        assert s.axes == "TYX"
        assert s.shape == (3, 4, 5)
    np.testing.assert_array_equal(tiff.imread(path), frames)
    mm = tiff.memmap(path, mode="r")
    np.testing.assert_array_equal(np.asarray(mm), frames)
