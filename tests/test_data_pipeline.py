"""Bucketed LibriSpeech pipeline over a synthetic on-disk corpus: CSV
bucketing (reference utils/dataset.py:26-53 semantics), native FLAC decode,
shape quantization, transcripts/labels, and per-host sharding."""

import csv
import os

import numpy as np
import pytest

from fithubert_tpu.config import DataConfig
from fithubert_tpu.data.librispeech import (
    BucketedLibriSpeech,
    make_buckets,
    quantize_length,
    read_bucket_csvs,
)
from tests.flac_writer import write_flac


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    """Fake LibriSpeech: root/<split>/<spk>/<chap>/<utt>.flac + trans + CSV."""
    root = tmp_path_factory.mktemp("librispeech")
    bucket_dir = root / "len_for_bucket"
    bucket_dir.mkdir()
    split = "train-tiny"
    rng = np.random.default_rng(0)
    rows = []
    chap_dir = root / split / "1" / "2"
    chap_dir.mkdir(parents=True)
    trans_lines = []
    for u in range(6):
        n = 2000 + 700 * u
        sig = np.round(2000 * np.sin(np.arange(n) * 0.05 + u)).astype(np.int64)
        utt = f"1-2-{u:04d}"
        write_flac(str(chap_dir / f"{utt}.flac"), [sig], kind="fixed1")
        rows.append((f"{split}/1/2/{utt}.flac", n))
        trans_lines.append(f"{utt} HELLO WORLD {u}")
    (chap_dir / "1-2.trans.txt").write_text("\n".join(trans_lines) + "\n")
    with open(bucket_dir / f"{split}.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["file_path", "length"])
        w.writeheader()
        for p, l in rows:
            w.writerow({"file_path": p, "length": l})
    return str(root), split


def _cfg(root, **kw):
    return DataConfig(
        bucketing_path=os.path.join(root, "len_for_bucket"),
        libri_root=root,
        length_quantum=1000,
        num_workers=2,
        prefetch=1,
        **kw,
    )


REF_BUCKET_DIR = "/root/reference/data/len_for_bucket"


@pytest.mark.skipif(
    not os.path.isdir(REF_BUCKET_DIR), reason="reference checkout not present"
)
def test_reference_shipped_csvs_parse_directly():
    """The reference ships its bucket manifests as pandas-style CSVs with an
    unnamed index column and a trailing `label` column
    (utils/dataset.py:26-34). They must drop straight into our reader — a
    reference user points bucketing_path at their existing len_for_bucket
    dir and gets the same (file_path, length) rows, descending."""
    rows = read_bucket_csvs(REF_BUCKET_DIR, ["train-clean-100"], None)
    assert len(rows) == 28539
    paths, lengths = zip(*rows)
    assert lengths == tuple(sorted(lengths, reverse=True))
    assert all(p.startswith("train-clean-100/") and p.endswith(".flac")
               for p in paths[:100])
    assert all(isinstance(l, int) and l > 0 for l in lengths[:100])


def test_rows_sorted_descending(corpus):
    root, split = corpus
    rows = read_bucket_csvs(os.path.join(root, "len_for_bucket"), [split])
    lengths = [l for _p, l in rows]
    assert lengths == sorted(lengths, reverse=True)


def test_trailing_single_bucket_dropped():
    rows = [(f"f{i}", 100 - i) for i in range(7)]
    buckets = make_buckets(rows, 3)  # 3+3+1 -> last dropped
    assert [len(b) for b in buckets] == [3, 3]
    buckets = make_buckets(rows + [("x", 1)], 3)  # 3+3+2 -> kept
    assert [len(b) for b in buckets] == [3, 3, 2]


def test_quantize_length():
    assert quantize_length(4100, 1000) == 5000
    assert quantize_length(4100, 1000, max_length=4500) == 4500
    assert quantize_length(4100, 1) == 4100


def test_epoch_batches_decode_and_mask(corpus):
    root, split = corpus
    ds = BucketedLibriSpeech(_cfg(root), [split], batch_size=2, accum=1,
                             shuffle=False)
    batches = list(ds.epoch(0))
    assert len(batches) == len(ds) == 3
    for b in batches:
        a, bs, t = b["x"].shape
        assert (a, bs) == (1, 2)
        assert t % 1000 == 0
        valid = ~b["padding_mask"]
        # decoded audio is nonzero inside the mask, zero outside
        assert np.abs(b["x"][valid.nonzero()]).mean() > 1e-4
        assert np.all(b["x"][b["padding_mask"]] == 0)


def test_labels_and_transcripts(corpus):
    root, split = corpus
    ds = BucketedLibriSpeech(_cfg(root, load_labels=True), [split],
                             batch_size=2, accum=1, shuffle=False)
    b = next(iter(ds.epoch(0)))
    assert b["labels"].shape[:2] == (1, 2)
    assert b["label_paddings"].shape == b["labels"].shape
    txt = b["_transcripts"][0][0]
    assert txt.startswith("HELLO WORLD")
    n_valid = int((1 - b["label_paddings"][0, 0]).sum())
    assert n_valid == len(txt)  # one letter id per character ('|' for space)


def test_host_sharding(corpus):
    """Multi-host = row striping within GLOBALLY IDENTICAL buckets: every
    host sees the same bucket list (same step count, same padded shapes),
    and the decoded row stripes are disjoint and reassemble the full batch."""
    root, split = corpus
    full = BucketedLibriSpeech(_cfg(root), [split], batch_size=2, shuffle=False)
    h0 = BucketedLibriSpeech(_cfg(root), [split], batch_size=2, shuffle=False,
                             host_id=0, num_hosts=2)
    h1 = BucketedLibriSpeech(_cfg(root), [split], batch_size=2, shuffle=False,
                             host_id=1, num_hosts=2)
    assert h0.buckets == h1.buckets == full.buckets
    assert len(h0) == len(h1) == len(full)
    bf = next(iter(full.epoch(0)))
    b0 = next(iter(h0.epoch(0)))
    b1 = next(iter(h1.epoch(0)))
    # same padded global shape; local stripes are half the rows
    assert b0["x"].shape == b1["x"].shape == (1, 1, bf["x"].shape[2])
    # stripes reassemble the full bucket rows (order-insensitive)
    rows_full = {bytes(r.tobytes()) for r in bf["x"][0]}
    rows_sharded = {bytes(b0["x"][0, 0].tobytes()),
                    bytes(b1["x"][0, 0].tobytes())}
    assert rows_sharded == rows_full


def test_grad_accum_grouping(corpus):
    root, split = corpus
    ds = BucketedLibriSpeech(_cfg(root), [split], batch_size=2, accum=2,
                             shuffle=False)
    b = next(iter(ds.epoch(0)))
    assert b["x"].shape[0] == 2  # A microbatches


def test_trailing_accum_group_trains_every_bucket(corpus):
    """With accum=2 over 3 buckets, the trailing bucket must still be
    yielded (squared off with a fake all-padding microbatch) — the reference
    trains every batch Lightning delivers (train.py:471,499); dropping up to
    accum-1 buckets per epoch was a silent data-coverage deviation."""
    root, split = corpus
    ds = BucketedLibriSpeech(_cfg(root), [split], batch_size=2, accum=2,
                             shuffle=False)
    assert len(ds.buckets) == 3
    assert len(ds) == 2  # ceil(3 / 2)
    batches = list(ds.epoch(0))
    assert len(batches) == 2
    # every real utterance appears exactly once across the epoch
    real_rows = sum(
        int((~b["padding_mask"][a]).any(axis=-1).sum())
        for b in batches
        for a in range(b["x"].shape[0])
    )
    assert real_rows == 6
    # the fake microbatch is fully padded and silent
    last = batches[-1]
    assert last["x"].shape[0] == 2
    assert bool(last["padding_mask"][1].all())
    assert np.all(last["x"][1] == 0.0)


def test_trailing_group_without_pad_batch_stays_short(corpus):
    """pad_batch_to_full=False keeps true bucket sizes, so a fake (-1)
    microbatch has no well-defined row count — the trailing group must stay
    SHORT (A < accum) instead of crashing np.stack on a 0-row fake."""
    root, split = corpus
    ds = BucketedLibriSpeech(_cfg(root), [split], batch_size=2, accum=2,
                             shuffle=False, pad_batch_to_full=False)
    assert len(ds.buckets) == 3
    batches = list(ds.epoch(0))
    assert len(batches) == 2
    assert batches[0]["x"].shape[0] == 2  # full group
    assert batches[-1]["x"].shape[0] == 1  # short trailing group, no fake
    real_rows = sum(
        int((~b["padding_mask"][a]).any(axis=-1).sum())
        for b in batches
        for a in range(b["x"].shape[0])
    )
    assert real_rows == 6  # every utterance still trains


def test_trailing_accum_group_step_is_finite(corpus):
    """A step batch whose last microbatch is entirely fabricated must flow
    through the jitted train step with a finite loss and finite grads."""
    import jax
    import jax.numpy as jnp

    from fithubert_tpu.parallel import make_mesh
    from fithubert_tpu.train.step import Distiller
    from tests.test_train_step import tiny_cfg, tiny_teacher_geometry

    root, split = corpus
    ds = BucketedLibriSpeech(_cfg(root), [split], batch_size=2, accum=2,
                             shuffle=False)
    batch = list(ds.epoch(0))[-1]  # trailing group: [real bucket, fake]
    cfg = tiny_cfg()
    d = Distiller(cfg, mesh=make_mesh(1), num_training_steps=10,
                  teacher_geometry=tiny_teacher_geometry())
    rng = jax.random.PRNGKey(0)
    wav = jnp.asarray(batch["x"], jnp.float32)
    mask = jnp.asarray(batch["padding_mask"])
    tp = d.init_teacher_params(rng, wav[0])
    state = d.init_state(jax.random.PRNGKey(1), wav[0])
    step = d.make_train_step()
    state, logs = step(state, tp, {"x": wav, "padding_mask": mask},
                       jnp.zeros((1,), jnp.int32), rng)
    assert np.isfinite(float(logs["loss"]))
    assert np.isfinite(float(logs["grad_norm"]))


def test_scan_split_skips_corrupt_files(tmp_path):
    """A truncated/garbage audio file must be skipped with a warning, not
    abort the whole corpus scan (bucket-CSV generation)."""
    import numpy as np

    from fithubert_tpu.data.librispeech import scan_split
    from tests.flac_writer import write_flac

    chap = tmp_path / "train-clean-100" / "1" / "2"
    chap.mkdir(parents=True)
    rng = np.random.default_rng(0)
    good = np.round(1000 * rng.standard_normal(4000)).astype(np.int64)
    write_flac(str(chap / "1-2-0000.flac"), [good], kind="verbatim")
    # garbage bytes with a flac extension (header parse raises/ fails)
    (chap / "1-2-0001.flac").write_bytes(b"fLaC" + b"\x00\x07" * 40)
    (chap / "1-2-0002.flac").write_bytes(b"not flac at all")
    # truncated wav
    (chap / "1-2-0003.wav").write_bytes(b"RIFF\x00\x00")

    rows = scan_split(str(tmp_path), "train-clean-100")
    assert [os.path.basename(p) for p, _ in rows] == ["1-2-0000.flac"]
    assert rows[0][1] == 4000
