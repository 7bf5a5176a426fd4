"""Length-bucketed LibriSpeech pipeline with XLA-friendly shape quantization.

Reference semantics (utils/dataset.py:11-77): read per-split CSVs
(file_path,length), sort all utterances by length DESCENDING, chunk into
fixed batch_size buckets, pad each bucket to its longest utterance.

TPU deltas (SURVEY.md §5.7): padded lengths are quantized UP to multiples of
`length_quantum` samples so XLA sees a small closed set of shapes (the
reference's exact-length padding would trigger thousands of recompiles);
grad-accumulation microbatches are grouped into one (A, B, T) step batch
padded to the group max; decode happens on a host thread pool with
prefetching. Multi-host sharding strides ROWS within globally-identical
buckets so every host agrees on the padded (global) batch shape.
"""

from __future__ import annotations

import concurrent.futures as cf
import csv
import os
import queue
import threading
import uuid
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from fithubert_tpu.config import DataConfig
from fithubert_tpu.data import audio


def flac_num_samples(path: str) -> int:
    """Total samples from the FLAC STREAMINFO header (no decode)."""
    with open(path, "rb") as f:
        head = f.read(4)
        if head != b"fLaC":
            return -1
        while True:
            hdr = f.read(4)
            if len(hdr) < 4:
                return -1
            block_type = hdr[0] & 0x7F
            last = hdr[0] & 0x80
            length = (hdr[1] << 16) | (hdr[2] << 8) | hdr[3]
            body = f.read(length)
            if len(body) < length:
                return -1  # truncated metadata block: not a valid flac
            if block_type == 0 and length >= 34:
                return ((body[13] & 0x0F) << 32) | (body[14] << 24) | \
                       (body[15] << 16) | (body[16] << 8) | body[17]
            if last:
                return -1


def scan_split(libri_root: str, split: str) -> List[Tuple[str, int]]:
    """Walk `<libri_root>/<split>` collecting (relative path, num samples).
    Traversal is fully sorted so every host derives IDENTICAL row order
    (the downstream length sort is stable; ties must not differ per host,
    or the host_id::num_hosts bucket stripes would overlap)."""
    rows: List[Tuple[str, int]] = []
    split_dir = os.path.join(libri_root, split)
    for dirpath, dirs, files in os.walk(split_dir):
        dirs.sort()
        for fn in sorted(files):
            if not fn.endswith((".flac", ".wav")):
                continue
            full = os.path.join(dirpath, fn)
            try:
                n = (flac_num_samples(full) if fn.endswith(".flac")
                     else len(audio.decode(full)))
            except Exception:  # corrupt header/file (struct.error, OSError,
                n = -1         # ...): try the fallback decode below
            if n <= 0 and fn.endswith(".flac"):
                # header read failed (non-native-FLAC container, or a
                # STREAMINFO with unknown total_samples == 0): fall back to a
                # full decode rather than silently dropping the utterance
                try:
                    n = len(audio.decode(full))
                except Exception:
                    n = -1
            if n > 0:
                rows.append((os.path.relpath(full, libri_root), n))
            else:
                print(f"[data] skipping undecodable file: {full}")
    return rows


def generate_bucket_csv(libri_root: str, split: str, out_dir: str) -> str:
    """Write `<out_dir>/<split>.csv` (file_path,length) by scanning the
    corpus — the same format as the reference's precomputed s3prl manifests
    (reference utils/dataset.py:26-34). Returns the CSV path."""
    rows = scan_split(libri_root, split)
    if not rows:
        raise FileNotFoundError(
            f"corpus not found: no .flac/.wav files under "
            f"{os.path.join(libri_root, split)}"
        )
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, f"{split}.csv")
    # atomic write: concurrent hosts racing the auto-generation must only
    # ever see an absent or a COMPLETE csv (both writers produce identical
    # content thanks to the sorted scan, so last-rename-wins is harmless).
    # The tmp name carries a uuid: on a shared filesystem two HOSTS can share
    # a pid, and a pid-only suffix would interleave their writes.
    tmp_path = f"{out_path}.tmp.{os.getpid()}.{uuid.uuid4().hex[:8]}"
    with open(tmp_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["file_path", "length"])
        w.writeheader()
        for p, n in rows:
            w.writerow({"file_path": p, "length": n})
    os.replace(tmp_path, out_path)
    return out_path


def read_bucket_csvs(
    file_path: str, sets: Sequence[str], libri_root: str = ""
) -> List[Tuple[str, int]]:
    """Read (file_path, length) rows from the reference's bucket CSVs.

    Missing split CSVs are auto-generated from `libri_root` (the reference
    hard-requires the precomputed manifests, utils/dataset.py:26-34; here a
    user pointing at a corpus never hits a missing-metadata error)."""
    rows: List[Tuple[str, int]] = []
    for s in sets:
        csv_path = os.path.join(file_path, s + ".csv")
        if not os.path.exists(csv_path) and libri_root:
            if os.path.isdir(os.path.join(libri_root, s)):
                print(f"[data] bucket CSV missing; scanning corpus -> {csv_path}")
                generate_bucket_csv(libri_root, s, file_path)
            else:
                raise FileNotFoundError(
                    f"corpus not found: neither bucket CSV {csv_path} nor "
                    f"corpus split {os.path.join(libri_root, s)} exists"
                )
        with open(csv_path) as f:
            reader = csv.DictReader(f)
            for r in reader:
                rows.append((r["file_path"], int(r["length"])))
    rows.sort(key=lambda t: -t[1])
    return rows


def make_buckets(
    rows: List[Tuple[str, int]], batch_size: int
) -> List[List[Tuple[str, int]]]:
    """Fixed-size buckets over the descending-length list (dataset.py:38-53).

    The reference keeps a trailing partial bucket only if it has >1 items."""
    buckets = [
        rows[i : i + batch_size] for i in range(0, len(rows), batch_size)
    ]
    if buckets and len(buckets[-1]) <= 1:
        buckets.pop()
    elif buckets and len(buckets[-1]) < batch_size:
        pass  # keep partial bucket (>1 items), matching the reference
    return buckets


def quantize_length(length: int, quantum: int, max_length: int = 0) -> int:
    q = ((length + quantum - 1) // quantum) * quantum if quantum > 1 else length
    if max_length > 0:
        q = min(q, max_length)
    return max(q, quantum if quantum > 1 else length)


def _load_transcript(libri_root: str, rel_path: str, cache: Dict[str, Dict[str, str]]) -> str:
    """LibriSpeech transcript lookup: `<dir>/<spk>-<chap>.trans.txt` rows are
    '<utt-id> <TEXT>'. Cached per trans file."""
    d = os.path.dirname(os.path.join(libri_root, rel_path))
    utt_id = os.path.splitext(os.path.basename(rel_path))[0]
    spk_chap = "-".join(utt_id.split("-")[:2])
    trans_path = os.path.join(d, spk_chap + ".trans.txt")
    if trans_path not in cache:
        table: Dict[str, str] = {}
        if os.path.exists(trans_path):
            with open(trans_path) as f:
                for line in f:
                    parts = line.strip().split(" ", 1)
                    if len(parts) == 2:
                        table[parts[0]] = parts[1]
        cache[trans_path] = table
    return cache[trans_path].get(utt_id, "")


class BucketedLibriSpeech:
    """Iterable over (A, B, T) step batches of padded waveforms + masks."""

    def __init__(
        self,
        cfg: DataConfig,
        sets: Sequence[str],
        batch_size: int,
        accum: int = 1,
        shuffle: bool = True,
        seed: int = 0,
        host_id: int = 0,
        num_hosts: int = 1,
        pad_batch_to_full: bool = True,
    ):
        self.cfg = cfg
        self.batch_size = batch_size
        self.accum = max(1, accum)
        self.shuffle = shuffle
        self.seed = seed
        self.pad_batch_to_full = pad_batch_to_full
        rows = read_bucket_csvs(cfg.bucketing_path, sets, cfg.libri_root)
        if cfg.max_wav_length > 0:
            rows = [(p, min(l, cfg.max_wav_length)) for (p, l) in rows]
        buckets = make_buckets(rows, batch_size)
        # Multi-host sharding strides ROWS WITHIN each bucket, not buckets:
        # every host derives the identical global bucket list (deterministic
        # CSV/scan order), so t_pad/u_pad — the GLOBAL batch shape — agree on
        # all hosts, and each host decodes only its batch_size/num_hosts row
        # stripe. (Bucket-striding would give hosts different padded shapes,
        # which a global-mesh array cannot have.)
        assert batch_size % num_hosts == 0, (batch_size, num_hosts)
        assert pad_batch_to_full or num_hosts == 1, (
            "multi-host needs pad_batch_to_full: partial buckets would give "
            "hosts different local row counts"
        )
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.buckets = buckets
        self.num_samples = sum(len(b) for b in self.buckets)
        self._trans_cache: Dict[str, Dict[str, str]] = {}
        self._dictionary = None
        if cfg.load_labels:
            from fithubert_tpu.utils.text import LetterDictionary, default_dict_path

            path = cfg.dict_path or default_dict_path()
            self._dictionary = (
                LetterDictionary.load(path)
                if os.path.exists(path)
                else LetterDictionary()
            )

    def __len__(self) -> int:
        # ceil: the trailing partial accum group trains too (padded with fake
        # all-padding microbatches), matching the reference where Lightning
        # accumulates whatever arrives (reference train.py:471,499)
        return -(-len(self.buckets) // self.accum)

    def _load_bucket(self, bucket, t_pad: int, u_pad: int = 0):
        # this host's row stripe of the (conceptually batch_size-padded)
        # global bucket; fake all-padding rows land on whichever host owns
        # their global position
        rows = list(bucket) + [None] * (self.batch_size - len(bucket))
        if not self.pad_batch_to_full:
            rows = list(bucket)
        local = rows[self.host_id :: self.num_hosts]
        bucket = [r for r in local if r is not None]
        b = len(bucket)
        out_b = len(local) if self.pad_batch_to_full else b
        x = np.zeros((out_b, t_pad), dtype=np.float32)
        mask = np.ones((out_b, t_pad), dtype=bool)
        labels = label_pads = None
        transcripts: List[str] = []
        if self._dictionary is not None:
            labels = np.zeros((out_b, u_pad), dtype=np.int32)
            label_pads = np.ones((out_b, u_pad), dtype=np.float32)
        paths = [os.path.join(self.cfg.libri_root, p) for (p, _l) in bucket]
        decoded, lengths = audio.decode_batch(paths, t_pad, self.cfg.num_workers)
        x[:b] = decoded
        for i, (path, _length) in enumerate(bucket):
            n = int(lengths[i])
            if self.cfg.max_wav_length > 0 and n > self.cfg.max_wav_length:
                n = self.cfg.max_wav_length
                x[i, n:] = 0.0
            mask[i, :n] = False
            if self._dictionary is not None:
                text = _load_transcript(self.cfg.libri_root, path, self._trans_cache)
                transcripts.append(text)
                ids = self._dictionary.encode(text)[:u_pad]
                labels[i, : len(ids)] = ids
                label_pads[i, : len(ids)] = 0.0
        return x, mask, labels, label_pads, transcripts

    def _build_group(self, group) -> Dict[str, np.ndarray]:
        """Load + pad one accum group of buckets into an (A, B, T) batch.

        A bucket index of -1 is a FAKE microbatch (all-padding rows) used to
        square off the trailing partial accum group — previously those
        buckets were silently dropped every epoch. The loss masks fabricated
        rows out of every reduction; in the accum-scan path the 1/accum
        gradient scale then matches Lightning's treatment of a partial
        trailing window (the fused path computes the equally valid global
        weighted mean — see the caveat note in train/step.py)."""
        bs = [self.buckets[int(g)] if int(g) >= 0 else [] for g in group]
        t_pad = max(
            quantize_length(
                max(l for (_p, l) in b), self.cfg.length_quantum,
                self.cfg.max_wav_length,
            )
            for b in bs
            if b
        )
        # label width scales with audio length (~1 char / 400 samples is a
        # safe LibriSpeech upper bound), quantized for shape stability
        u_pad = quantize_length(t_pad // 400 + 16, self.cfg.label_quantum)
        loaded = [self._load_bucket(b, t_pad, u_pad) for b in bs]
        batch = {
            "x": np.stack([l[0] for l in loaded]),  # (A, B, T)
            "padding_mask": np.stack([l[1] for l in loaded]),
        }
        if self._dictionary is not None:
            batch["labels"] = np.stack([l[2] for l in loaded])
            batch["label_paddings"] = np.stack([l[3] for l in loaded])
            batch["_transcripts"] = [l[4] for l in loaded]  # host-only
        return batch

    def _groups(self, epoch_idx: int):
        order = np.arange(len(self.buckets))
        if self.shuffle:
            np.random.default_rng(self.seed + epoch_idx).shuffle(order)
        pad = (-len(order)) % self.accum
        if pad and self.pad_batch_to_full:
            # square off the trailing group with fake (-1) all-padding
            # microbatches; without pad_batch_to_full a fake bucket has no
            # well-defined row count (real buckets keep their true sizes),
            # so the trailing group simply stays short (A < accum) there
            order = np.concatenate([order, np.full(pad, -1, order.dtype)])
        return [
            order[i : i + self.accum] for i in range(0, len(order), self.accum)
        ]

    def first_batch(self) -> Dict[str, np.ndarray]:
        """One step batch for shape/init probing, built inline — epoch()
        spins up the prefetch pool and decodes ahead, all wasted when the
        generator is abandoned after the first yield."""
        return self._build_group(self._groups(0)[0])

    def epoch(self, epoch_idx: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        """Yield step batches; buckets shuffled per epoch (train.py:425 shuffle=True)."""
        groups = self._groups(epoch_idx)
        build = self._build_group

        n_prefetch = self.cfg.prefetch
        with cf.ThreadPoolExecutor(max_workers=max(1, self.cfg.num_workers)) as ex:
            pending: "queue.Queue" = queue.Queue()
            it = iter(groups)
            for _ in range(n_prefetch + 1):
                g = next(it, None)
                if g is not None:
                    pending.put(ex.submit(build, g))
            while not pending.empty():
                fut = pending.get()
                g = next(it, None)
                if g is not None:
                    pending.put(ex.submit(build, g))
                yield fut.result()


class SyntheticDataset:
    """Corpus-free batches (benches/smoke tests): harmonic sweeps + noise.

    batch_size is GLOBAL; each host generates its batch_size/num_hosts row
    stripe (seed folded with host_id so rows differ across hosts)."""

    def __init__(self, cfg: DataConfig, batch_size: int, accum: int = 1,
                 seed: int = 0, host_id: int = 0, num_hosts: int = 1):
        assert batch_size % num_hosts == 0, (batch_size, num_hosts)
        self.cfg = cfg
        self.batch_size = batch_size // num_hosts
        self.accum = max(1, accum)
        self.seed = seed + 100003 * host_id
        self.num_samples = cfg.synthetic_num_batches * batch_size

    def __len__(self) -> int:
        return max(1, self.cfg.synthetic_num_batches // self.accum)

    def first_batch(self) -> Dict[str, np.ndarray]:
        return next(iter(self.epoch(0)))

    def epoch(self, epoch_idx: int = 0) -> Iterator[Dict[str, np.ndarray]]:
        rng = np.random.default_rng(self.seed + epoch_idx)
        t = quantize_length(
            self.cfg.synthetic_wav_length, self.cfg.length_quantum
        )
        for _ in range(len(self)):
            ts = np.arange(t, dtype=np.float32) / 16000.0
            f0 = rng.uniform(80, 300, size=(self.accum, self.batch_size, 1))
            x = 0.1 * np.sin(2 * np.pi * f0 * ts) + 0.01 * rng.standard_normal(
                (self.accum, self.batch_size, t)
            ).astype(np.float32)
            lengths = rng.integers(int(0.8 * t), t + 1, size=(self.accum, self.batch_size))
            mask = np.arange(t)[None, None, :] >= lengths[..., None]
            x = np.where(mask, 0.0, x).astype(np.float32)
            batch = {"x": x, "padding_mask": mask}
            if self.cfg.load_labels:
                from fithubert_tpu.utils.text import LETTERS, SPECIALS, LetterDictionary

                u_pad = quantize_length(t // 400 + 16, self.cfg.label_quantum)
                n_sym = len(SPECIALS) + len(LETTERS)
                labels = np.zeros((self.accum, self.batch_size, u_pad), np.int32)
                pads = np.ones((self.accum, self.batch_size, u_pad), np.float32)
                look_up = LetterDictionary().look_up
                transcripts = []
                for a in range(self.accum):
                    row = []
                    for b in range(self.batch_size):
                        u = int(rng.integers(4, max(5, u_pad // 2)))
                        ids = rng.integers(4, n_sym, size=u)
                        labels[a, b, :u] = ids
                        pads[a, b, :u] = 0.0
                        row.append(
                            " ".join("".join(look_up[ids]).split("|")).rstrip()
                        )
                    transcripts.append(row)
                batch["labels"] = labels
                batch["label_paddings"] = pads
                batch["_transcripts"] = transcripts
            yield batch


def make_dataset(
    cfg: DataConfig, sets: Sequence[str], batch_size: int, accum: int = 1,
    shuffle: bool = True, seed: int = 0, host_id: int = 0, num_hosts: int = 1,
):
    if cfg.synthetic:
        return SyntheticDataset(cfg, batch_size, accum, seed, host_id, num_hosts)
    return BucketedLibriSpeech(
        cfg, sets, batch_size, accum, shuffle, seed, host_id, num_hosts
    )
