"""Data-layer tests: .mat loaders, minmax parity, conflict injection,
synthetic generators, audio featurization, native C++ parity."""

import os
import wave
from pathlib import Path

import numpy as np
import pytest

from disentagled_multimodal_fusion_tpu.data.multiview import (
    DATASET_REGISTRY,
    MultiViewDataset,
    minmax_scale,
)
from disentagled_multimodal_fusion_tpu.data.synthetic import (
    SimpleTwoModalPlus,
    generate_data_simple,
    make_simple_plus_splits,
)

HAS_MAT = (Path(__file__).parent.parent / "data" / "handwritten.mat").exists()
RNG = np.random.default_rng(0)


def test_minmax_matches_sklearn():
    from sklearn.preprocessing import MinMaxScaler

    x = RNG.standard_normal((50, 7)) * 3 + 1
    x[:, 3] = 2.0  # zero-range feature
    ref = MinMaxScaler((0, 1)).fit_transform(x)
    got = minmax_scale(x, (0, 1))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-9)
    ref = MinMaxScaler((-1, 1)).fit_transform(x)
    got = minmax_scale(x, (-1, 1))
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-9)


@pytest.mark.skipif(not HAS_MAT, reason="data/*.mat not present")
def test_mat_loaders():
    """Shapes from SURVEY.md §2.1 (verified against the shipped .mat files)."""
    hw = DATASET_REGISTRY["HandWritten"]()
    assert hw.num_views == 6 and len(hw) == 2000 and hw.num_classes == 10
    assert [int(d[0]) for d in hw.dims] == [240, 76, 216, 47, 64, 6]
    views, y = hw.arrays()
    assert all(v.min() >= 0.0 and v.max() <= 1.0 for v in views)
    assert y.min() == 0 and y.max() == 9

    cub = DATASET_REGISTRY["CUB"]()
    assert cub.num_views == 2 and len(cub) == 600 and cub.num_classes == 10
    assert [int(d[0]) for d in cub.dims] == [1024, 300]

    pie = DATASET_REGISTRY["PIE"]()
    assert pie.num_views == 3 and len(pie) == 680 and pie.num_classes == 68

    scene = DATASET_REGISTRY["Scene"]()
    assert scene.num_views == 3 and len(scene) == 4485 and scene.num_classes == 15
    assert [int(d[0]) for d in scene.dims] == [20, 59, 40]


def test_conflict_injection():
    """Conflict replaces one view of selected rows with the NEXT class's
    first-occurrence prototype; labels unchanged (dataset.py:246-268)."""
    n, v, d, c = 60, 3, 8, 4
    x = np.stack([RNG.random((n, d)) for _ in range(v)])
    y = np.repeat(np.arange(c), n // c)
    ds = MultiViewDataset("t", x, y.copy() + 1)  # +1 to exercise 0-base shift
    assert ds.Y.min() == 0
    orig = [xv.copy() for xv in ds.X]
    protos = {
        cc: {vv: ds.X[vv][np.where(ds.Y == cc)[0][0]].copy() for vv in range(v)}
        for cc in range(c)
    }
    test_idx = np.arange(30, 60)
    rng = np.random.default_rng(5)
    ds.postprocessing(test_idx, addConflict=True, ratio_conflict=1.0, rng=rng)
    # labels unchanged
    np.testing.assert_array_equal(ds.Y, y)
    changed = 0
    for i in test_idx:
        for vv in range(v):
            if not np.allclose(ds.X[vv][i], orig[vv][i]):
                changed += 1
                expected = protos[(ds.Y[i] + 1) % c][vv]
                np.testing.assert_allclose(ds.X[vv][i], expected)
    assert changed >= len(test_idx) * 0.8  # one view per selected row
    # train rows untouched
    for vv in range(v):
        np.testing.assert_allclose(ds.X[vv][:30], orig[vv][:30])


def test_noise_injection():
    n, v, d = 40, 2, 6
    x = np.stack([np.zeros((n, d), np.float32) for _ in range(v)])
    ds = MultiViewDataset("t", x, np.zeros(n))
    ds.postprocessing(
        np.arange(n), addNoise=True, sigma=1.0, ratio_noise=0.5,
        rng=np.random.default_rng(0),
    )
    per_row = [np.abs(ds.X[vv]).sum(1) > 0 for vv in range(v)]
    noised_rows = np.logical_or.reduce(per_row).sum()
    assert 10 <= noised_rows <= 20  # exactly 20 selected, >=1 view each


def test_simple_two_modal_plus():
    ds = SimpleTwoModalPlus(n_samples=500, rho=0.8, shared_class_frac=0.8, seed=3)
    assert ds.X1.shape == (500, 32) and ds.X2.shape == (500, 32)
    assert set(np.unique(ds.y)) <= {0, 1, 2}
    # dependence knob: rho=1 -> G1 == G2 (before class means/noise)
    ds_full = SimpleTwoModalPlus(
        n_samples=200, rho=1.0, shared_class_frac=0.0, noise_std=0.0,
        hetero_noise=False, d_spurious=0, nonlinear_shared=False,
        beta_specific=0.0, alpha_shared=1.0, seed=0,
    )
    np.testing.assert_allclose(ds_full.extras["G1"], ds_full.extras["G2"], atol=1e-6)

    ds0, train, val = make_simple_plus_splits(n_samples=300, seed=1, rho=0.5)
    (x1t, x2t), yt = train
    (x1v, x2v), yv = val
    assert len(yt) == 240 and len(yv) == 60
    assert x1t.shape[1] == 32


def test_generate_data_simple():
    total, labels, extras = generate_data_simple(
        400, {"Zs": 4, "Z1": 4, "Z2": 4, "X": 10, "Y": 10}, shared_frac=0.5, seed=0
    )
    assert total.shape == (2, 400, 10)
    assert set(np.unique(labels)) == {0.0, 1.0}
    # median threshold keeps classes roughly balanced
    assert 0.4 < labels.mean() < 0.6


def test_wav_roundtrip_and_native_parity(tmp_path):
    from disentagled_multimodal_fusion_tpu.data.audio import mfcc, wav_to_mfcc_mean
    from disentagled_multimodal_fusion_tpu.data.native_featurizer import (
        available,
        featurize_wav_files,
        mfcc_mean_native,
    )

    mono = (RNG.standard_normal(24000) * 0.1).astype(np.float32)
    ref = mfcc(mono).mean(axis=1)
    if available():
        nat = mfcc_mean_native(mono)
        np.testing.assert_allclose(nat, ref, atol=1e-4)

    p = tmp_path / "t.wav"
    with wave.open(str(p), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(22050)
        sig = (RNG.standard_normal((22050, 2)) * 3000).astype("<i2")
        w.writeframes(sig.tobytes())
    feats = featurize_wav_files([str(p)])
    ref2 = wav_to_mfcc_mean(str(p))
    assert feats.shape == (1, 40)
    np.testing.assert_allclose(feats[0], ref2, atol=5e-3)


def test_fake_luma_pipeline(tmp_path):
    from disentagled_multimodal_fusion_tpu.data.luma import get_luma_arrays, make_fake_luma
    from disentagled_multimodal_fusion_tpu.runners.test_luma import main as smoke

    root = make_fake_luma(tmp_path / "luma", n_classes=3, train_per_class=4, test_per_class=2)
    xs_tr, y_tr, xs_te, y_te, n_cls, n_views, dims = get_luma_arrays(root)
    assert n_cls == 3 and n_views == 3
    assert xs_tr[0].shape == (12, 40)
    assert xs_tr[1].shape == (12, 128)
    assert xs_tr[2].shape == (12, 3072)
    assert len(y_te) == 6
    # images are real (bug fix): per-class color channel -> features differ
    assert not np.allclose(xs_tr[2][0], xs_tr[2][-1])
    # replicate_image_bug -> identical placeholder everywhere
    xs_bug, *_ = get_luma_arrays(root, replicate_image_bug=True, cache=False)
    assert np.allclose(xs_bug[2][0], xs_bug[2][-1])
    assert smoke(["--data-path", root]) == 0


def test_luma_ood_arrays(tmp_path):
    """get_luma_ood_arrays returns only held-out-class test rows, and the
    feature cache keys ID vs OOD sample sets separately."""
    from disentagled_multimodal_fusion_tpu.data.luma import (
        get_luma_arrays, get_luma_ood_arrays, make_fake_luma,
    )

    root = make_fake_luma(
        tmp_path / "luma", n_classes=3, train_per_class=3, test_per_class=2,
        ood_classes=2)
    xs_tr, y_tr, xs_te, y_te, n_cls, _, _ = get_luma_arrays(root)
    assert n_cls == 3 and set(np.unique(y_te)) == {0, 1, 2}

    xs_ood, y_ood, n_id = get_luma_ood_arrays(root)
    assert n_id == 3
    assert len(y_ood) == 2 * 2  # 2 OOD classes x 2 test rows
    assert set(np.unique(y_ood)) == {3, 4}
    assert xs_ood[0].shape[0] == len(y_ood)
    # ID arrays unchanged by the OOD pass (distinct cache files)
    xs_te2 = get_luma_arrays(root)[2]
    assert np.allclose(xs_te[0], xs_te2[0])

    # explicit metadata 'ood_classes' manifest that does NOT sort after the
    # ID names: class_0 is designated OOD -> the split must follow the
    # list, not alphabetical order (ADVICE r2: real corpora don't promise
    # the OOD names sort last)
    import yaml as _yaml
    from pathlib import Path as _Path

    meta_path = _Path(root) / "metadata.yaml"
    meta = _yaml.safe_load(meta_path.read_text())
    meta.update(num_classes=4, num_ood_classes=1, ood_classes=["class_0"])
    meta_path.write_text(_yaml.safe_dump(meta))
    xs_ood2, y_ood2, n_id2 = get_luma_ood_arrays(root)
    assert n_id2 == 4
    assert len(y_ood2) == 2  # 1 OOD class x 2 test rows
    assert set(np.unique(y_ood2)) == {4}  # OOD indexed after the 4 ID classes


def test_fake_luma_use_2d(tmp_path):
    """data.audio.use_2d: the featurizer emits full (n_mfcc, frames) MFCC
    maps and the 2D-spectrogram AudioEncoder branch consumes them — the
    producer the reference never shipped for classifiers.py:155-217."""
    import jax

    from disentagled_multimodal_fusion_tpu.data.luma import (
        get_luma_arrays, make_fake_luma,
    )
    from disentagled_multimodal_fusion_tpu.models.layers import AudioEncoder

    root = make_fake_luma(
        tmp_path / "luma", n_classes=2, train_per_class=3, test_per_class=1)
    audio_cfg = {"sample_rate": 16000, "max_length": 1.0, "n_mfcc": 40,
                 "use_mfcc": True, "use_2d": True}
    xs_tr, y_tr, xs_te, y_te, n_cls, _, _ = get_luma_arrays(root, audio_cfg)
    assert xs_tr[0].ndim == 3 and xs_tr[0].shape[1] == 40  # (N, n_mfcc, T)
    frames = xs_tr[0].shape[2]
    assert frames > 1  # a real time axis, not the time-mean

    enc = AudioEncoder(input_dim=40, output_dim=16, dropout=0.1, use_2d=True)
    key = jax.random.PRNGKey(0)
    variables = enc.init({"params": key, "dropout": key}, xs_tr[0], train=False)
    out = enc.apply(variables, xs_tr[0], train=False)
    assert out.shape == (len(y_tr), 16)

    # 1D cache and 2D cache are distinct files; 1D request still gets means
    xs_1d, *_ = get_luma_arrays(root, {**audio_cfg, "use_2d": False})
    assert xs_1d[0].ndim == 2 and xs_1d[0].shape[1] == 40
    assert np.allclose(np.asarray(xs_tr[0]).mean(axis=2), xs_1d[0], atol=1e-4)


@pytest.mark.skipif(
    not Path("/root/reference/datasets/dataset.py").exists(),
    reason="reference not mounted",
)
def test_conflict_and_noise_bit_identical_to_reference():
    """rng=None uses the legacy global np.random stream with the reference's
    exact call order -> bit-identical perturbed arrays under the same seed."""
    import importlib.util
    import sys

    sys.path.insert(0, "/root/reference")  # dataset.py does bare sklearn imports
    spec = importlib.util.spec_from_file_location(
        "ref_dataset", "/root/reference/datasets/dataset.py"
    )
    ref_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_mod)

    n, v, d, c = 60, 3, 8, 4
    base = np.stack([RNG.random((n, d)).astype(np.float64) for _ in range(v)])
    y = np.repeat(np.arange(c), n // c) + 1  # 1-based like the .mat labels

    ref_ds = ref_mod.MultiViewDataset("t", base.copy(), y.copy())
    ours = MultiViewDataset("t", base.copy(), y.copy())
    # we store f32 (device upload); the reference keeps f64 — compare at f32
    for vv in range(v):
        np.testing.assert_array_equal(ours.X[vv], ref_ds.X[vv].astype(np.float32))

    test_idx = np.arange(30, 60)
    np.random.seed(123)
    ref_ds.postprocessing(test_idx, addConflict=True, ratio_conflict=1.0)
    np.random.seed(123)
    ours.postprocessing(test_idx, addConflict=True, ratio_conflict=1.0, rng=None)
    for vv in range(v):
        # identical selection + prototype indices -> f32-identical arrays
        np.testing.assert_array_equal(ours.X[vv], ref_ds.X[vv].astype(np.float32))

    np.random.seed(7)
    ref_ds.postprocessing(test_idx, addNoise=True, sigma=0.5, ratio_noise=0.5)
    np.random.seed(7)
    ours.postprocessing(test_idx, addNoise=True, sigma=0.5, ratio_noise=0.5, rng=None)
    for vv in range(v):
        # identical gaussian draws; loc is f32-rounded on our side
        np.testing.assert_allclose(
            ours.X[vv], ref_ds.X[vv].astype(np.float32), atol=1e-6
        )


def test_wordpiece_matches_transformers_bert_tokenizer(tmp_path):
    """Our offline WordPiece (data/wordpiece.py) is algorithm-identical to
    transformers.BertTokenizer on a local vocab: with the genuine
    bert-base-uncased vocab.txt the LUMA text features are then bit-identical
    to the reference's AutoTokenizer path (dataset_luma.py:311-322)."""
    from transformers import BertTokenizer

    from disentagled_multimodal_fusion_tpu.data.wordpiece import WordPieceTokenizer

    vocab = (
        "[PAD] [UNK] [CLS] [SEP] [MASK] the quick brown fox jump ##s ##ed "
        "##ing over lazy dog cafe , . ! ? ' \" - 1 2 3 ##1 ##2 un ##believ "
        "##able a b c d e ##a ##b ##c ##d ##e 中 国"
    ).split()
    vf = tmp_path / "vocab.txt"
    vf.write_text("\n".join(vocab) + "\n", encoding="utf-8")

    hf = BertTokenizer(vocab_file=str(vf), do_lower_case=True)
    ours = WordPieceTokenizer.from_vocab_file(vf)

    texts = [
        "The quick brown fox jumps over the lazy dog.",
        "Café, CAFE!  café?",            # accents + case + punct
        "unbelievable jumping",                     # multi-piece words
        "zzz unknownword 123 ab",                   # [UNK], digits, subwords
        "\"quoted\" - 'text'",
        "中国 fox",                                  # CJK spacing
        "a" * 120,                                  # >100 chars -> [UNK]
        "",                                         # empty string
        "the " * 100,                               # truncation at max_length
    ]
    for text in texts:
        assert ours.tokenize(text) == hf.tokenize(text), text
        ref_ids = hf(text, max_length=16, padding="max_length", truncation=True)[
            "input_ids"
        ]
        assert ours.encode(text, 16) == ref_ids, text
    assert ours.vocab_size == hf.vocab_size


def test_luma_text_fallback_warns_loudly(tmp_path, monkeypatch):
    """Without network/cache/vendored vocab the hash fallback must warn."""
    import warnings as w

    from disentagled_multimodal_fusion_tpu.data import wordpiece

    monkeypatch.setattr(wordpiece, "DEFAULT_VOCAB_LOCATIONS", ())
    assert wordpiece.find_local_vocab(None) is None
    assert wordpiece.find_local_vocab(str(tmp_path / "missing.txt")) is None


def test_wav_float32_and_short_input_decoding(tmp_path):
    """Decoder-robustness regressions: IEEE-float32 WAVs decode identically
    in the native and numpy paths (stdlib wave rejects fmt=3, the native
    int32 branch used to mangle it), and sub-pad-length inputs use repeated
    reflection instead of reading out of bounds."""
    import struct

    from disentagled_multimodal_fusion_tpu.data.audio import (
        mfcc, read_wav, wav_to_mfcc_mean,
    )
    from disentagled_multimodal_fusion_tpu.data.native_featurizer import (
        available, featurize_wav_files, mfcc_mean_native,
    )

    # hand-rolled float32 WAV (fmt tag 3)
    sig = (RNG.standard_normal(8000) * 0.1).astype("<f4")
    raw = sig.tobytes()
    p = tmp_path / "f32.wav"
    with open(p, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 16000,
                                      16000 * 4, 4, 32))
        f.write(b"data" + struct.pack("<I", len(raw)) + raw)

    wav, rate = read_wav(str(p))
    assert rate == 16000
    np.testing.assert_allclose(wav[0], sig, atol=1e-6)

    ref = wav_to_mfcc_mean(str(p), sample_rate=16000, max_length_s=0.5)
    feats = featurize_wav_files([str(p)], sample_rate=16000, max_length_s=0.5)
    np.testing.assert_allclose(feats[0], ref, atol=5e-3)

    # short input: n=100 < pad=200 -> np.pad repeated reflection; native must
    # match (the single-bounce version read out of bounds here)
    short = (RNG.standard_normal(100) * 0.1).astype(np.float32)
    ref_s = mfcc(short).mean(axis=1)
    if available():
        nat_s = mfcc_mean_native(short)
        np.testing.assert_allclose(nat_s, ref_s, atol=1e-4)


def test_caltech_loader_on_fixture(tmp_path, monkeypatch):
    """The Caltech101-20 .mat is missing from the reference snapshot
    (.MISSING_LARGE_BLOBS), so exercise the loader (reference
    dataset.py:304-310 structure: X object-array .squeeze(), Y key) on a
    synthetic .mat with the documented view dims — it must activate as
    soon as the real file appears."""
    import scipy.io as sio

    import disentagled_multimodal_fusion_tpu.data.multiview as mv

    dims = [48, 40, 254, 1984, 512, 928]  # reference dataset.py:305 comment
    n, c = 40, 4
    views = np.empty((len(dims),), dtype=object)
    for i, d in enumerate(dims):
        views[i] = RNG.random((n, d)).astype(np.float64)
    y = (np.repeat(np.arange(c), n // c) + 1).reshape(-1, 1)  # 1-based
    (tmp_path / "data").mkdir()
    sio.savemat(tmp_path / "data" / "Caltech101-20.mat",
                {"X": views.reshape(1, -1), "Y": y})

    monkeypatch.setattr(mv, "DATA_DIR", tmp_path / "data")
    ds = mv.DATASET_REGISTRY["CalTech"]()
    assert ds.num_views == 6 and len(ds) == n and ds.num_classes == c
    assert [int(d[0]) for d in ds.dims] == dims
    xs, labels = ds.arrays()
    assert labels.min() == 0 and labels.max() == c - 1  # 0-based shift
    assert all(v.min() >= 0.0 and v.max() <= 1.0 for v in xs)  # minmaxed
