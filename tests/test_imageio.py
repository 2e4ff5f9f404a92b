import numpy as np
import pytest

from nnuzoo_tpu.imageio.nifti import NiftiIO, read_nifti, write_nifti
from nnuzoo_tpu.imageio.natural import NaturalImage2DIO
from nnuzoo_tpu.imageio.numpy_io import NumpyIO
from nnuzoo_tpu.imageio.registry import (determine_reader_writer_from_dataset_json,
                                         find_reader_writer_by_name)
from nnuzoo_tpu.imageio.tiff import Tiff3DIO


class TestNifti:
    @pytest.mark.parametrize("gz", [False, True])
    def test_roundtrip(self, tmp_path, rng, gz):
        fname = str(tmp_path / ("img.nii.gz" if gz else "img.nii"))
        data = rng.randint(0, 1000, size=(7, 9, 11)).astype(np.int16)
        write_nifti(fname, data, spacing_xyz=(0.7, 1.2, 3.0))
        back, info = read_nifti(fname)
        assert back.shape == (7, 9, 11)
        assert np.array_equal(back, data)
        assert np.allclose(info["spacing_xyz"], (0.7, 1.2, 3.0))

    def test_reader_writer_convention(self, tmp_path, rng):
        # write per-channel files, read as case
        io = NiftiIO()
        fnames = []
        vol = rng.rand(6, 8, 10).astype(np.float32)  # on-disk (x, y, z)
        for c in range(2):
            f = str(tmp_path / f"case_000{c}.nii.gz")
            write_nifti(f, vol + c, spacing_xyz=(1.0, 2.0, 3.0))
            fnames.append(f)
        data, props = io.read_images(fnames)
        assert data.shape == (2, 10, 8, 6)  # (c, z, y, x)
        assert props["spacing"] == [3.0, 2.0, 1.0]
        assert np.allclose(data[1] - data[0], 1.0)

        # seg round trip restores geometry via stored header
        seg = (vol > 0.5).astype(np.uint8).transpose(2, 1, 0)  # (z, y, x)
        out = str(tmp_path / "seg.nii.gz")
        io.write_seg(seg, out, props)
        seg_back, props_back = io.read_seg(out)
        assert seg_back.shape == (1, 10, 8, 6)
        assert np.array_equal(seg_back[0].astype(np.uint8), seg)
        assert props_back["spacing"] == props["spacing"]

    def test_big_endian_roundtrip(self, tmp_path, rng):
        # fabricate a big-endian NIfTI by byte-swapping a little-endian one,
        # then verify seg write-with-reused-header produces a valid LE file
        from nnuzoo_tpu.imageio.nifti import (_HDR_F32_OFFSETS, _HDR_I16_OFFSETS,
                                              _HDR_I32_OFFSETS, HDR_SIZE)
        le = str(tmp_path / "le.nii")
        data = rng.randint(0, 500, size=(5, 6, 7)).astype(np.int16)
        write_nifti(le, data, spacing_xyz=(0.5, 1.5, 2.5))
        raw = bytearray(open(le, "rb").read())
        for off in _HDR_I32_OFFSETS + _HDR_F32_OFFSETS:
            raw[off:off + 4] = bytes(raw[off:off + 4])[::-1]
        for off in _HDR_I16_OFFSETS:
            raw[off:off + 2] = bytes(raw[off:off + 2])[::-1]
        body = np.frombuffer(bytes(raw[352:]), dtype=np.int16).byteswap().tobytes()
        be = str(tmp_path / "be.nii")
        open(be, "wb").write(bytes(raw[:352]) + body)

        back, info = read_nifti(be)
        assert info["swapped"]
        assert np.array_equal(back, data)
        assert np.allclose(info["spacing_xyz"], (0.5, 1.5, 2.5))

        # reused header must now be little-endian end to end
        io = NiftiIO()
        img, props = io.read_images([be])
        out = str(tmp_path / "seg_from_be.nii")
        io.write_seg((img[0] > 250).astype(np.uint8), out, props)
        seg_back, props_back = io.read_seg(out)
        assert not read_nifti(out)[1]["swapped"]
        assert props_back["spacing"] == props["spacing"]
        assert np.array_equal(seg_back[0], (img[0] > 250).astype(np.uint8))

    def test_scl_slope(self, tmp_path):
        # manually patch scl_slope into a written file
        import struct
        fname = str(tmp_path / "img.nii")
        data = np.arange(24, dtype=np.int16).reshape(2, 3, 4)
        write_nifti(fname, data, spacing_xyz=(1, 1, 1))
        raw = bytearray(open(fname, "rb").read())
        struct.pack_into("<f", raw, 112, 2.0)  # scl_slope
        struct.pack_into("<f", raw, 116, 1.0)  # scl_inter
        open(fname, "wb").write(bytes(raw))
        back, _ = read_nifti(fname)
        assert np.allclose(back, data.astype(np.float32) * 2 + 1)


def test_natural_2d(tmp_path, rng):
    from PIL import Image
    io = NaturalImage2DIO()
    arr = rng.randint(0, 255, size=(32, 48), dtype=np.uint8)
    f = str(tmp_path / "img.png")
    Image.fromarray(arr).save(f)
    data, props = io.read_images([f])
    assert data.shape == (1, 1, 32, 48)
    assert props["spacing"] == [999.0, 1.0, 1.0]
    seg = (arr > 128).astype(np.uint8)
    out = str(tmp_path / "seg.png")
    io.write_seg(seg[None], out, props)
    back, _ = io.read_seg(out)
    assert np.array_equal(back[0, 0], seg)


def test_tiff_3d(tmp_path, rng):
    io = Tiff3DIO()
    seg = rng.randint(0, 3, size=(4, 16, 16)).astype(np.uint8)
    out = str(tmp_path / "vol.tif")
    io.write_seg(seg, out, {"spacing": [2.0, 1.0, 1.0]})
    back, props = io.read_seg(out)
    assert back.shape == (1, 4, 16, 16)
    assert np.array_equal(back[0], seg)
    assert props["spacing"] == [2.0, 1.0, 1.0]


def test_numpy_io(tmp_path, rng):
    io = NumpyIO()
    vol = rng.rand(5, 6, 7).astype(np.float32)
    f = str(tmp_path / "case_0000.npy")
    np.save(f, vol)
    data, props = io.read_images([f])
    assert data.shape == (1, 5, 6, 7)


def test_registry():
    assert find_reader_writer_by_name("SimpleITKIO").__name__ == "NiftiIO"
    rw = determine_reader_writer_from_dataset_json({"file_ending": ".nii.gz"})
    assert rw.__name__ == "NiftiIO"
    rw = determine_reader_writer_from_dataset_json({"file_ending": ".png"})
    assert rw.__name__ == "NaturalImage2DIO"
    rw = determine_reader_writer_from_dataset_json(
        {"file_ending": ".tif", "overwrite_image_reader_writer": "NaturalImage2DIO"})
    assert rw.__name__ == "NaturalImage2DIO"
