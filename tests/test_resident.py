"""Device-resident pipeline: device-born sketch products must feed the
verify stage with ZERO re-upload (VERDICT round 3 item 1).

When the device sketches, its products (member bitmaps, fragment
streams, offsets) are adopted straight into the verify caches
(ops/fragment_ani.py: _BitmapPool.adopt / StreamArena.adopt); the
host mirrors exist only for the disk store / checkpoint path. These
tests pin (a) that no host-upload fill function runs during verify on
a device-sketched corpus, and (b) that results are bit-identical to
the host-sketched, host-uploaded path. Role parity: skani's in-process
sketch->search handoff (reference src/skani.rs:270-304).
"""

import os
import tempfile

import numpy as np
import pytest

from galah_tpu.engines.native import NativeContext, NativePreclusterer
from galah_tpu.utils.synth import make_families


@pytest.fixture(scope="module")
def corpus():
    td = tempfile.mkdtemp(prefix="galah-resident-test-")
    make_families(
        td, n_families=3, members_per_family=3,
        genome_length=30_000, within_ani=0.97, seed=21,
    )
    paths = sorted(
        os.path.join(td, f) for f in os.listdir(td) if f.endswith(".fna")
    )
    return paths


def _run(paths, monkeypatch, device_sketch: str, verify_mode=None,
         forbid_uploads=False):
    monkeypatch.setenv("GALAH_TPU_DEVICE_SKETCH", device_sketch)
    monkeypatch.setenv("GALAH_TPU_VERIFY_DEVICES", "1")
    if verify_mode:
        monkeypatch.setenv("GALAH_TPU_VERIFY", verify_mode)
    else:
        monkeypatch.delenv("GALAH_TPU_VERIFY", raising=False)
    ctx = NativeContext(max_genome_length=30_000)
    pre = NativePreclusterer(90.0, 0.15, ctx)
    sketches = ctx.sketch_many(paths)

    if forbid_uploads:
        import galah_tpu.ops.fragment_ani as fa

        def boom(name):
            def fn(*a, **k):
                raise AssertionError(
                    f"{name} ran during verify of a device-sketched "
                    "corpus: device-born products were re-uploaded"
                )
            return fn

        for name in ("_arena_fill", "_pool_fill_buckets",
                     "_pool_fill_dense"):
            monkeypatch.setattr(fa, name, boom(name))

    cache = pre._verify_pairs(
        sketches,
        np.array(
            [(i, j) for i in range(len(paths))
             for j in range(i + 1, len(paths))],
            dtype=np.int64,
        ),
        90.0,
        0.15,
    )
    return dict(cache.items())


def test_device_born_verify_never_reuploads(corpus, monkeypatch):
    """Verify of a device-sketched corpus must not execute any
    host-upload fill (arena fill, pool bucket/dense fill) — every
    stream and bitmap was adopted device-to-device at sketch time —
    and must match the host-sketched run exactly."""
    host = _run(corpus, monkeypatch, device_sketch="0")
    resident = _run(
        corpus, monkeypatch, device_sketch="1", forbid_uploads=True
    )
    assert resident == host
    assert len(resident) >= 9  # all within-family pairs survive


def test_device_born_grouped_path_never_reuploads(corpus, monkeypatch):
    """Same guarantee through the grouped one-query-many-refs kernel
    (query arrays built from the arena span via _query_from_arena)."""
    host = _run(corpus, monkeypatch, device_sketch="0",
                verify_mode="grouped")
    resident = _run(
        corpus, monkeypatch, device_sketch="1",
        verify_mode="grouped", forbid_uploads=True,
    )
    assert resident == host


def test_resident_kill_switch(corpus, monkeypatch):
    """GALAH_TPU_RESIDENT=0 disables adoption: the upload path runs
    (and still matches)."""
    monkeypatch.setenv("GALAH_TPU_RESIDENT", "0")
    host = _run(corpus, monkeypatch, device_sketch="0")
    no_adopt = _run(corpus, monkeypatch, device_sketch="1")
    assert no_adopt == host


def test_device_born_screen_matrix_no_reupload(corpus, monkeypatch):
    """Full distances() flow with the packed single-device screen: the
    resident matrix is assembled from device-born pref rows and the
    verify caches from adopted products — no host-upload fill runs
    after sketching, and the sparse cache matches the host path."""
    def full(device_sketch: str, forbid: bool):
        monkeypatch.setenv("GALAH_TPU_SCREEN", "packed")
        monkeypatch.setenv("GALAH_TPU_DEVICE_SKETCH", device_sketch)
        monkeypatch.setenv("GALAH_TPU_VERIFY_DEVICES", "1")
        ctx = NativeContext(max_genome_length=30_000)
        pre = NativePreclusterer(90.0, 0.15, ctx)
        sketches = ctx.sketch_many(corpus)
        built = []
        if forbid:
            import galah_tpu.ops.fragment_ani as fa

            def boom(name):
                def fn(*a, **k):
                    raise AssertionError(f"{name} ran (re-upload)")
                return fn

            for name in ("_arena_fill", "_pool_fill_buckets",
                         "_pool_fill_dense"):
                monkeypatch.setattr(fa, name, boom(name))
            # Record that the device-resident matrix builder actually
            # produced the matrix (None would silently fall back to
            # the host-upload assembly, which this test must exclude).
            orig_builder = ctx.pref_matrix_builder

            def wrapped(*a, **k):
                b = orig_builder(*a, **k)
                assert b is not None, "no device-born pref rows cached"

                def build(n_pad):
                    out = b(n_pad)
                    assert out is not None
                    built.append(n_pad)
                    return out

                return build

            monkeypatch.setattr(ctx, "pref_matrix_builder", wrapped)
        try:
            res = dict(pre._screen_and_verify(sketches).items())
        finally:
            monkeypatch.delenv("GALAH_TPU_SCREEN")
        if forbid:
            assert built, "resident matrix builder never ran"
        return res

    host = full("0", forbid=False)
    resident = full("1", forbid=True)
    assert resident == host
    assert len(resident) >= 9
