"""DICOM reader tests against hand-built explicit/implicit-LE files."""

import os
import struct

import numpy as np
import pytest

from mmnn_sts_tpu.data.dicom import (
    EXPLICIT_LE,
    IMPLICIT_LE,
    load_dicom_series,
    read_dicom_file,
)

from fixtures import dicom_meta as _meta, write_dicom_slice as _write_slice


@pytest.mark.parametrize("explicit", [True, False])
def test_series_roundtrip(tmp_path, rng, explicit):
    vols = []
    for i in range(4):
        sl = rng.integers(-300, 300, size=(6, 8)).astype(np.int16)
        vols.append(sl)
        # write out of order; z increases with instance
        _write_slice(str(tmp_path / f"s{3 - i}.dcm"), sl, explicit,
                     instance=i + 1, z=float(i) * 2.5)
    vol = load_dicom_series(str(tmp_path))
    assert vol.shape == (4, 6, 8)
    np.testing.assert_allclose(vol, np.stack(vols).astype(np.float32))


def test_rescale_applied(tmp_path, rng):
    sl = rng.integers(0, 100, size=(4, 4)).astype(np.int16)
    p = str(tmp_path / "s.dcm")
    _write_slice(p, sl, True, 1, 0.0, slope=2.0, inter=-100.0)
    s = read_dicom_file(p)
    from mmnn_sts_tpu.data.dicom import _slice_array

    np.testing.assert_allclose(
        _slice_array(s), sl.astype(np.float32) * 2.0 - 100.0
    )


def test_unsupported_syntax_raises(tmp_path):
    blob = _meta("1.2.840.10008.1.2.4.100")  # MPEG2 (every JPEG family and
    # RLE now decodes natively, so only the video syntaxes remain unsupported)
    p = str(tmp_path / "bad.dcm")
    with open(p, "wb") as f:
        f.write(blob)
    with pytest.raises(ValueError, match="unsupported transfer syntax"):
        read_dicom_file(p)


# ---------------------------------------------------------------------------
# Physical-space geometry (sitk.Resample(mask, image) parity —
# /root/reference/data/ImageDatasets.py:146; ADVICE r2 medium)
# ---------------------------------------------------------------------------

from fixtures import write_dicom_multiframe as _write_mf


def _write_image_series(d, vol, z0=0.0, dz=2.0, spacing=(1.0, 1.0),
                        origin_xy=(0.0, 0.0)):
    os.makedirs(d, exist_ok=True)
    for k in range(vol.shape[0]):
        _write_slice(os.path.join(d, f"s{k:03d}.dcm"), vol[k],
                     instance=k + 1, z=z0 + k * dz, origin_xy=origin_xy,
                     pixel_spacing=spacing)


def test_series_geometry_parsed(tmp_path, rng):
    vol = rng.integers(0, 100, size=(5, 6, 8)).astype(np.int16)
    _write_image_series(str(tmp_path), vol, z0=10.0, dz=2.0,
                        spacing=(0.5, 0.75), origin_xy=(1.0, -2.0))
    v, geom = load_dicom_series(str(tmp_path), with_geometry=True)
    assert geom is not None
    np.testing.assert_allclose(geom.origin, [1.0, -2.0, 10.0])
    np.testing.assert_allclose(geom.pixel_spacing, (0.5, 0.75))
    np.testing.assert_allclose(geom.z_offsets, [0, 2, 4, 6, 8])


def test_geometry_none_without_spacing(tmp_path, rng):
    # legacy fixtures (no PixelSpacing) -> no geometry -> array-space path
    sl = rng.integers(0, 10, size=(4, 4)).astype(np.int16)
    _write_slice(str(tmp_path / "s.dcm"), sl, instance=1, z=0.0)
    _, geom = load_dicom_series(str(tmp_path), with_geometry=True)
    assert geom is None


def test_same_grid_mask_returned_unchanged(tmp_path, rng):
    from mmnn_sts_tpu.data.dicom import resample_to_grid

    vol = rng.integers(0, 100, size=(4, 6, 6)).astype(np.int16)
    _write_image_series(str(tmp_path / "img"), vol)
    mask = np.zeros((4, 6, 6), np.int16)
    mask[1:3, 2:4, 2:4] = 255
    _write_mf(str(tmp_path / "mask.dcm"), mask, position=(0, 0, 0),
              pixel_spacing=(1.0, 1.0), grid_offsets=[0, 2, 4, 6])
    _, igeom = load_dicom_series(str(tmp_path / "img"), with_geometry=True)
    mvol, mgeom = load_dicom_series(str(tmp_path / "mask.dcm"),
                                    with_geometry=True)
    out = resample_to_grid(mvol, mgeom, (4, 6, 6), igeom)
    np.testing.assert_array_equal(out, mvol)


def test_z_reversed_multiframe_mask_lands_correctly(tmp_path, rng):
    """A mask stored top-down (descending GridFrameOffsetVector) with the
    SAME array shape as the image must be flipped, not used as stored —
    the silent-misalignment case ADVICE r2 flagged."""
    from mmnn_sts_tpu.data.dicom import resample_to_grid

    nz = 6
    img = rng.integers(0, 100, size=(nz, 8, 8)).astype(np.int16)
    _write_image_series(str(tmp_path / "img"), img, z0=0.0, dz=2.0)
    # stored frame 0 is the TOP slice (physical z = 10)
    mask = np.zeros((nz, 8, 8), np.int16)
    mask[0, 2:6, 2:6] = 255
    _write_mf(str(tmp_path / "mask.dcm"), mask, position=(0, 0, 10.0),
              pixel_spacing=(1.0, 1.0),
              grid_offsets=[-2.0 * k for k in range(nz)])
    _, igeom = load_dicom_series(str(tmp_path / "img"), with_geometry=True)
    mvol, mgeom = load_dicom_series(str(tmp_path / "mask.dcm"),
                                    with_geometry=True)
    out = resample_to_grid(mvol, mgeom, img.shape, igeom)
    # blob is at physical z=10 -> image slice index 5 (z0=0, dz=2)
    assert out[5, 2:6, 2:6].min() == 255
    assert out[:5].max() == 0


def test_shifted_origin_same_shape_resampled(tmp_path, rng):
    """Same array shape but origin shifted one slice in z: previously used
    verbatim (shape-equality fast path); physically it must shift."""
    from mmnn_sts_tpu.data.dicom import resample_to_grid

    nz = 6
    img = rng.integers(0, 100, size=(nz, 8, 8)).astype(np.int16)
    _write_image_series(str(tmp_path / "img"), img, z0=0.0, dz=2.0)
    mask = np.zeros((nz, 8, 8), np.int16)
    mask[2, 2:6, 2:6] = 255  # mask-slice 2 sits at physical z = 2 + 2*2 = 6
    _write_mf(str(tmp_path / "mask.dcm"), mask, position=(0, 0, 2.0),
              pixel_spacing=(1.0, 1.0),
              grid_offsets=[2.0 * k for k in range(nz)])
    _, igeom = load_dicom_series(str(tmp_path / "img"), with_geometry=True)
    mvol, mgeom = load_dicom_series(str(tmp_path / "mask.dcm"),
                                    with_geometry=True)
    out = resample_to_grid(mvol, mgeom, img.shape, igeom)
    assert out[3, 2:6, 2:6].min() == 255  # image slice 3 is physical z=6
    assert out[2].max() == 0


def test_inplane_spacing_resample_covers_same_extent(tmp_path, rng):
    """Mask at 2x coarser in-plane spacing and half resolution covers the
    same physical region after resampling."""
    from mmnn_sts_tpu.data.dicom import resample_to_grid

    img = rng.integers(0, 100, size=(4, 16, 16)).astype(np.int16)
    _write_image_series(str(tmp_path / "img"), img, dz=2.0)
    mask = np.full((4, 8, 8), 255, np.int16)  # full coverage at 2mm pixels
    _write_mf(str(tmp_path / "mask.dcm"), mask, position=(0, 0, 0),
              pixel_spacing=(2.0, 2.0), grid_offsets=[0, 2, 4, 6])
    _, igeom = load_dicom_series(str(tmp_path / "img"), with_geometry=True)
    mvol, mgeom = load_dicom_series(str(tmp_path / "mask.dcm"),
                                    with_geometry=True)
    out = resample_to_grid(mvol, mgeom, img.shape, igeom)
    # interior voxels of the image grid all fall inside the 255 region
    assert (out[:, :15, :15] == 255).all()


def test_cross_orientation_raises(tmp_path, rng):
    from mmnn_sts_tpu.data.dicom import SeriesGeometry, resample_to_grid

    g_img = SeriesGeometry(
        origin=np.zeros(3), row_dir=np.array([1.0, 0, 0]),
        col_dir=np.array([0, 1.0, 0]), pixel_spacing=(1, 1),
        z_offsets=np.arange(4.0),
    )
    g_mask = SeriesGeometry(
        origin=np.zeros(3), row_dir=np.array([0, 1.0, 0]),
        col_dir=np.array([1.0, 0, 0]), pixel_spacing=(1, 1),
        z_offsets=np.arange(4.0),
    )
    with pytest.raises(ValueError, match="orientation"):
        resample_to_grid(np.zeros((4, 4, 4), np.float32), g_mask,
                         (4, 4, 4), g_img)


def test_load_dicom_pair_uses_physical_space(tmp_path, rng):
    """_load_dicom_pair end-to-end: z-reversed mask masks the right slices."""
    from mmnn_sts_tpu.data.images import PatientRecord, _load_dicom_pair

    nz = 6
    img = np.full((nz, 8, 8), 100, np.int16)
    _write_image_series(str(tmp_path / "image"), img, z0=0.0, dz=2.0)
    mask = np.zeros((nz, 8, 8), np.int16)
    mask[0] = 255  # stored first, physically TOP (z=10)
    _write_mf(str(tmp_path / "m.dcm"), mask, position=(0, 0, 10.0),
              pixel_spacing=(1.0, 1.0),
              grid_offsets=[-2.0 * k for k in range(nz)])
    rec = PatientRecord(anon_id="a", uid=1,
                        image_path=str(tmp_path / "image"),
                        mask_path=str(tmp_path / "m.dcm"), format="dicom")
    image, bmask = _load_dicom_pair(rec)
    assert bmask[5].min() == 1.0
    assert bmask[:5].max() == 0.0


def test_deflated_explicit_vr(tmp_path):
    """1.2.840.10008.1.2.1.99: the post-meta dataset is one raw-deflate
    stream (PS3.5 A.5); GDCM read these for the reference."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from fixtures import write_dicom_deflated

    rng = np.random.default_rng(3)
    img = rng.integers(-1000, 3000, size=(14, 18)).astype(np.int16)
    p = str(tmp_path / "d.dcm")
    write_dicom_deflated(p, img)
    s = read_dicom_file(p)
    assert s.rows == 14 and s.cols == 18
    np.testing.assert_array_equal(load_dicom_series(p),
                                  img.astype(np.float32)[None])


def test_explicit_vr_big_endian(tmp_path):
    """The retired big-endian syntax: tags, lengths, US values, and pixel
    words are all byte-swapped; the meta group stays little-endian."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from fixtures import write_dicom_big_endian

    rng = np.random.default_rng(4)
    img = rng.integers(-1000, 3000, size=(12, 16)).astype(np.int16)
    p = str(tmp_path / "b.dcm")
    write_dicom_big_endian(p, img)
    s = read_dicom_file(p)
    assert s.rows == 12 and s.cols == 16
    np.testing.assert_array_equal(load_dicom_series(p),
                                  img.astype(np.float32)[None])


def test_deflated_series_sorts_by_position(tmp_path):
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from fixtures import write_dicom_deflated

    rng = np.random.default_rng(5)
    vol = rng.integers(0, 2000, size=(4, 10, 12)).astype(np.int16)
    d = tmp_path / "ser"
    d.mkdir()
    for k in range(4):
        write_dicom_deflated(str(d / f"s{k}.dcm"), vol[k], instance=k + 1,
                             z=5.0 * (3 - k))  # reversed file order
    out = np.asarray(load_dicom_series(str(d)))
    np.testing.assert_array_equal(out, vol[::-1].astype(np.float32))
