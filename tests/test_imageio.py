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


class TestSitkFormats:
    """MetaImage/NRRD/GIPL round-trips (reference SimpleITKIO surface)."""

    def _vol(self, seed=0):
        rng = np.random.RandomState(seed)
        return (rng.rand(6, 10, 8) * 100).astype(np.float32)  # (z, y, x)

    @pytest.mark.parametrize("ending", [".mha", ".nrrd", ".gipl", ".gipl.gz"])
    def test_roundtrip(self, tmp_path, ending):
        from nnuzoo_tpu.imageio.sitk_formats import SitkFormatsIO
        vol = self._vol()
        seg = (vol > 50).astype(np.uint8)
        io = SitkFormatsIO()
        f_img = str(tmp_path / ("img" + ending))
        f_seg = str(tmp_path / ("seg" + ending))
        # write via the format writers, read through the IO class
        from nnuzoo_tpu.imageio import sitk_formats as sf
        writer = {"mha": sf.write_mha, "nrrd": sf.write_nrrd,
                  "gipl": sf.write_gipl}[ending.split(".")[1]]
        writer(f_img, vol, (2.5, 1.5, 1.0))
        data, props = io.read_images([f_img])
        assert data.shape == (1, 6, 10, 8)
        np.testing.assert_allclose(data[0], vol, rtol=1e-6)
        np.testing.assert_allclose(props["spacing"], (2.5, 1.5, 1.0), atol=1e-6)
        # seg write/read round-trip
        io.write_seg(seg, f_seg, props)
        seg2, props2 = io.read_seg(f_seg)
        np.testing.assert_array_equal(seg2[0], seg)
        np.testing.assert_allclose(props2["spacing"], props["spacing"],
                                   atol=1e-6)

    def test_mha_compressed(self, tmp_path):
        import zlib
        from nnuzoo_tpu.imageio.sitk_formats import read_mha
        vol = self._vol().astype(np.int16)
        payload = zlib.compress(np.ascontiguousarray(vol).tobytes())
        hdr = (b"ObjectType = Image\nNDims = 3\nBinaryData = True\n"
               b"CompressedData = True\nDimSize = 8 10 6\n"
               b"ElementType = MET_SHORT\nElementSpacing = 1 1 3\n"
               b"ElementDataFile = LOCAL\n")
        f = str(tmp_path / "c.mha")
        open(f, "wb").write(hdr + payload)
        data, info = read_mha(f)
        np.testing.assert_array_equal(data, vol)
        assert info["spacing_zyx"] == [3.0, 1.0, 1.0]

    def test_nrrd_gzip_and_big_endian(self, tmp_path):
        import gzip as _gz
        from nnuzoo_tpu.imageio.sitk_formats import read_nrrd
        vol = self._vol().astype(">f4")
        hdr = ("NRRD0004\ntype: float\ndimension: 3\nsizes: 8 10 6\n"
               "endian: big\nencoding: gzip\n"
               "space directions: (1,0,0) (0,2,0) (0,0,4)\n\n")
        f = str(tmp_path / "g.nrrd")
        open(f, "wb").write(hdr.encode() +
                            _gz.compress(np.ascontiguousarray(vol).tobytes()))
        data, info = read_nrrd(f)
        np.testing.assert_allclose(data, vol.astype(np.float32))
        assert info["spacing_zyx"] == [4.0, 2.0, 1.0]

    def test_registry_dispatch(self):
        from nnuzoo_tpu.imageio.registry import (
            determine_reader_writer_from_dataset_json)
        from nnuzoo_tpu.imageio.sitk_formats import SitkFormatsIO
        rw = determine_reader_writer_from_dataset_json(
            {"file_ending": ".mha"})
        assert rw is SitkFormatsIO
        from nnuzoo_tpu.imageio.nifti import NiftiIOWithReorient
        rw2 = determine_reader_writer_from_dataset_json(
            {"file_ending": ".nii.gz",
             "overwrite_image_reader_writer": "NibabelIOWithReorient"})
        assert rw2 is NiftiIOWithReorient


class TestReorientToRAS:
    def _write_lps_nifti(self, fname, data_xyz, spacing):
        """NIfTI whose sform encodes LPS orientation (x,y flipped vs RAS)."""
        import struct
        from nnuzoo_tpu.imageio.nifti import _build_header
        hdr = bytearray(_build_header(data_xyz.shape, spacing, data_xyz.dtype))
        sx, sy, sz = spacing
        nx, ny = data_xyz.shape[0], data_xyz.shape[1]
        struct.pack_into("<4f", hdr, 280, -sx, 0, 0, sx * (nx - 1))  # srow_x
        struct.pack_into("<4f", hdr, 296, 0, -sy, 0, sy * (ny - 1))  # srow_y
        struct.pack_into("<4f", hdr, 312, 0, 0, sz, 0)               # srow_z
        payload = bytes(hdr) + b"\x00" * 4 + data_xyz.tobytes(order="F")
        open(fname, "wb").write(payload)

    def test_lps_to_ras_roundtrip(self, tmp_path):
        from nnuzoo_tpu.imageio.nifti import NiftiIO, NiftiIOWithReorient
        rng = np.random.RandomState(0)
        vol = rng.rand(8, 10, 6).astype(np.float32)   # (x, y, z)
        f = str(tmp_path / "lps.nii")
        self._write_lps_nifti(f, vol, (1.0, 1.0, 2.0))

        plain, _ = NiftiIO().read_images([f])
        ras, props = NiftiIOWithReorient().read_images([f])
        # LPS -> RAS flips x and y
        np.testing.assert_allclose(ras[0], plain[0][:, ::-1, ::-1])
        assert props["spacing"] == [2.0, 1.0, 1.0]

        # write_seg restores the original on-disk orientation
        seg_ras = (ras[0] > 0.5).astype(np.uint8)
        out = str(tmp_path / "seg.nii")
        NiftiIOWithReorient().write_seg(seg_ras, out, props)
        back, _ = NiftiIO().read_seg(out)
        np.testing.assert_array_equal(back[0], (plain[0] > 0.5).astype(np.uint8))

    def test_oblique_permutation(self, tmp_path):
        """Axis-permuted sform: data stored (z, x, y)-ish gets unscrambled."""
        import struct
        from nnuzoo_tpu.imageio.nifti import (_affine_from_header,
                                              _orientation_ops)
        from nnuzoo_tpu.imageio.nifti import _build_header
        hdr = bytearray(_build_header((4, 5, 6), (1, 1, 1), np.float32))
        # world R comes from data axis 1, A from axis 2, S from axis 0
        struct.pack_into("<4f", hdr, 280, 0, 1, 0, 0)
        struct.pack_into("<4f", hdr, 296, 0, 0, 1, 0)
        struct.pack_into("<4f", hdr, 312, 1, 0, 0, 0)
        aff = _affine_from_header(bytes(hdr))
        perm, flips = _orientation_ops(aff)
        assert perm == [1, 2, 0]
        assert flips == [False, False, False]
