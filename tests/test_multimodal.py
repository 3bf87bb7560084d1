"""Multimodal actor-pool stages: real Ray plumbing over binary columns,
deterministic fake audio/video payloads, real image codec path; values
pinned against pure-python recomputation."""

import numpy as np
import pandas as pd
import pytest

from doonop_ray.ops import multimodal as mm

SF = "/root/testdata/sf0.001"


def test_audio_features_pinned(ray_session):
    df = mm.audio_features(SF).set_index("audio_id")
    assert len(df) == 60
    # pin one clip against a direct recompute
    pcm, sr, n = mm.synth_audio(7)
    x = np.frombuffer(pcm, dtype="<i2").astype(np.float32) / 32768.0
    row = df.loc["aud-0000007"]
    assert row["duration_s"] == round(n / sr, 6)
    assert row["rms"] == pytest.approx(np.sqrt(np.mean(x * x)), abs=1e-6)
    assert row["peak"] == pytest.approx(np.max(np.abs(x)), abs=1e-6)
    assert 0.0 < row["zcr"] < 1.0


def test_video_frame_means_pinned(ray_session):
    df = mm.video_frame_means(SF)
    blob, w, h, nf, fps = mm.synth_video(3)
    frames = np.frombuffer(blob, dtype=np.uint8).reshape(nf, h, w, 3)
    sub = df[df["video_id"] == "vid-0000003"].set_index("frame_idx")
    assert list(sub.index) == list(range(0, nf, 4))
    assert sub.loc[0, "mean_r"] == round(float(frames[0, :, :, 0].mean()), 4)
    assert sub.loc[4, "mean_b"] == round(float(frames[4, :, :, 2].mean()), 4)


def test_image_resize_means_covers_world(ray_session):
    from doonop_ray.pipelines.flagship import world_for

    df = mm.image_resize_means(SF)
    w = world_for(SF)
    assert len(df) == w.images.num_rows
    assert (df["src_w"] >= 16).all() and (df["src_h"] >= 16).all()
    assert df["mean_r"].between(0, 255).all()


def test_unsupported_formats_raise():
    import pyarrow as pa

    bad_audio = pa.table({
        "audio_id": pa.array(["a"]), "bytes": pa.array([b"x"], pa.binary()),
        "sample_rate": pa.array([8000], pa.int32()),
        "n_samples": pa.array([1], pa.int32()),
        "fmt": pa.array(["mp3"]),
    })
    with pytest.raises(NotImplementedError):
        mm.AudioFeaturizer()(bad_audio)
    bad_video = pa.table({
        "video_id": pa.array(["v"]), "bytes": pa.array([b"x"], pa.binary()),
        "w": pa.array([1], pa.int32()), "h": pa.array([1], pa.int32()),
        "n_frames": pa.array([1], pa.int32()), "fps": pa.array([1], pa.int32()),
        "fmt": pa.array(["h264"]),
    })
    with pytest.raises(NotImplementedError):
        mm.VideoFrameSampler()(bad_video)


def test_build_training_dataset_end_to_end(ray_session, tmp_path):
    """The north_star end product: crawl → validate → image+caption
    dataset in the input_hint schema, written through the io seam.
    Every written payload must decode and PSNR-match regenerated truth."""
    import glob

    import numpy as np
    import pyarrow.parquet as pq

    from doonop_ray.codec import decode_image, psnr
    from doonop_ray.pipelines.flagship import (build_training_dataset,
                                               world_for)
    from doonop_ray.synth import expected_caption, expected_pixels

    out = str(tmp_path / "train")
    manifest = build_training_dataset(SF, out_root=out)
    files = sorted(glob.glob(f"{out}/shard-*.parquet"))
    assert list(manifest["shard"]) == files
    t = pq.read_table(files[0])
    assert t.column_names == ["image_id", "bytes", "w", "h", "fmt",
                              "caption", "phash"]
    assert int(manifest["rows"].sum()) == sum(
        pq.read_table(f).num_rows for f in files) > 0
    w = world_for(SF)
    row = t.slice(0, 1).to_pylist()[0]
    pix = decode_image(row["bytes"], row["fmt"])
    truth = expected_pixels(row["image_id"], w.params.seed,
                            w.params.img_min, w.params.img_max)
    assert psnr(truth, pix) >= 40.0
    assert row["caption"] == expected_caption(row["image_id"], w.params.seed)


def test_build_training_dataset_rerun_is_idempotent(ray_session, tmp_path):
    """Round-3 resumability contract: shard names are a pure function of
    their content (id batch digest), so a re-run overwrites the same
    shard files instead of duplicating the dataset."""
    import glob

    from doonop_ray.pipelines.flagship import build_training_dataset

    out = str(tmp_path / "train2")
    m1 = build_training_dataset(SF, out_root=out)
    files1 = sorted(glob.glob(f"{out}/shard-*.parquet"))
    m2 = build_training_dataset(SF, out_root=out)
    files2 = sorted(glob.glob(f"{out}/shard-*.parquet"))
    assert files1 == files2
    assert list(m1["shard"]) == list(m2["shard"])
    assert int(m1["rows"].sum()) == int(m2["rows"].sum())


def test_image_dedup_corpus_matches_union_find(ray_session):
    """image_dedup_corpus (distributed CC over phash near-dup pairs)
    must keep exactly the min-id representative of every cluster that
    an independent driver-side union-find over the same emitted pairs
    produces, with exact cluster sizes."""
    from doonop_ray.pipelines.flagship import (image_dedup_corpus,
                                               image_phash_neardup,
                                               world_for)

    SF = "/root/testdata/sf0.001"
    got = image_dedup_corpus(SF)
    pairs = image_phash_neardup(SF)
    w = world_for(SF)
    ids = w.images.column("image_id").to_pylist()

    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by numeric id so the root IS the representative
            lo, hi = sorted((ra, rb), key=lambda s: int(s.rsplit("-", 1)[1]))
            parent[hi] = lo
    clusters: dict[str, int] = {}
    for i in ids:
        clusters[find(i)] = clusters.get(find(i), 0) + 1

    expect = sorted(clusters)
    assert list(got["image_id"]) == expect
    assert {i: int(s) for i, s in zip(got["image_id"],
                                      got["cluster_size"])} == clusters
    # and some dedup actually happened in this world
    assert len(expect) < len(ids)
    # both size-routed paths produce the identical frame
    import pandas as pd

    pd.testing.assert_frame_equal(
        image_dedup_corpus(SF, method="unionfind"),
        image_dedup_corpus(SF, method="cc"))


def test_image_channel_stats_exact(ray_session):
    """Distributed moment partials must agree bit-for-bit with a naive
    per-image recompute (sums are exact int64 integers), and the
    independent violation check must come back empty."""
    from doonop_ray.codec import decode_image
    from doonop_ray.ops.checks import image_channel_stats_violations
    from doonop_ray.pipelines.flagship import world_for

    df = mm.image_channel_stats(SF).set_index("channel")
    w = world_for(SF)
    # naive recompute with float64 running sums in a THIRD ordering
    # (world order, not sorted) — exact integers commute regardless
    tot = np.zeros(3, np.int64)
    s = np.zeros(3, np.int64)
    blobs = w.images.column("bytes")
    fmts = w.images.column("fmt").to_pylist()
    for i in range(w.images.num_rows):
        pix = decode_image(blobs[i].as_buffer(), fmts[i])
        flat = pix.reshape(-1, 3).astype(np.int64)
        tot += pix.shape[0] * pix.shape[1]
        s += flat.sum(axis=0)
    for c, name in enumerate(["r", "g", "b"]):
        assert int(df.loc[name, "n_pixels"]) == int(tot[c])
        assert float(df.loc[name, "mean"]) == pytest.approx(
            s[c] / tot[c], abs=5.1e-5)
        assert 0 <= df.loc[name, "px_min"] <= df.loc[name, "px_max"] <= 255
        assert df.loc[name, "std"] <= (df.loc[name, "px_max"]
                                       - df.loc[name, "px_min"]) / 2 + 1e-9
    assert image_channel_stats_violations(SF).empty


def test_image_aspect_buckets_conservation_and_check(ray_session):
    from doonop_ray.ops.checks import image_aspect_buckets_violations
    from doonop_ray.pipelines.flagship import world_for

    df = mm.image_aspect_buckets(SF)
    w = world_for(SF)
    assert int(df["n_images"].sum()) == w.images.num_rows
    assert int(df["total_pixels"].sum()) == int(
        (w.images.column("w").to_numpy(zero_copy_only=False).astype(np.int64)
         * w.images.column("h").to_numpy(zero_copy_only=False).astype(
             np.int64)).sum())
    assert df["bucket"].is_unique
    assert image_aspect_buckets_violations(SF).empty


def test_image_check_tamper_detection(ray_session, monkeypatch):
    """Each new check must actually FIRE when the op under test lies."""
    from doonop_ray.ops import checks as ck

    good_stats = mm.image_channel_stats(SF)

    def bad_stats(sf_dir):
        out = good_stats.copy()
        out.loc[0, "mean"] = out.loc[0, "mean"] + 0.5
        return out

    monkeypatch.setattr(mm, "image_channel_stats", bad_stats)
    assert (ck.image_channel_stats_violations(SF)["kind"]
            == "moments").any()
    monkeypatch.undo()

    good_buckets = mm.image_aspect_buckets(SF)

    def bad_buckets(sf_dir):
        out = good_buckets.copy()
        out.loc[0, "n_images"] = out.loc[0, "n_images"] + 1
        return out

    monkeypatch.setattr(mm, "image_aspect_buckets", bad_buckets)
    kinds = set(ck.image_aspect_buckets_violations(SF)["kind"])
    assert "counts" in kinds and "conservation" in kinds
    monkeypatch.undo()

    def dup_channel(sf_dir):
        import pandas as pd

        return pd.concat([good_stats, good_stats.iloc[:1]],
                         ignore_index=True)

    monkeypatch.setattr(mm, "image_channel_stats", dup_channel)
    assert (ck.image_channel_stats_violations(SF)["kind"]
            == "dup_channel").any()
    monkeypatch.undo()

    def rogue_bucket(sf_dir):
        out = good_buckets.copy()
        extra = out.iloc[:1].copy()
        extra["bucket"] = 99
        extra["n_images"] = 0
        import pandas as pd

        return pd.concat([out, extra], ignore_index=True)

    monkeypatch.setattr(mm, "image_aspect_buckets", rogue_bucket)
    assert (ck.image_aspect_buckets_violations(SF)["kind"]
            == "bucket_range").any()


def test_ref_cache_invalidates_on_session_change(ray_session):
    """_ref_for must mint fresh refs when the Ray job id changes —
    refs from a previous ray.init are dangling after restart (simulated
    here by faking the recorded session stamp)."""
    from doonop_ray.pipelines import flagship as fl

    w = fl.world_for(SF)
    tier = fl.tier_of(SF)
    r1 = fl._ref_for(tier, w, "images")
    assert fl._ref_for(tier, w, "images") == r1  # cached within session
    fl._REF_SESSION[0] = "stale-job-id"
    r2 = fl._ref_for(tier, w, "images")
    assert r2 != r1  # cache cleared, fresh put
    assert fl._ref_for(tier, w, "images") == r2  # re-cached


def test_score_images_model_pinned(ray_session):
    """Batched image inference: one row per world image, scores pinned
    against a direct recompute for a sample, check empty, and the check
    fires on a tampered score."""
    from doonop_ray.codec import decode_image
    from doonop_ray.ops.checks import image_model_score_violations
    from doonop_ray.pipelines.flagship import world_for

    df = mm.score_images_model(SF)
    w = world_for(SF)
    assert len(df) == w.images.num_rows
    assert df["score"].between(0, 1).all()
    assert (df["keep"] == (df["score"] >= 0.5)).all()
    # pin three images against a direct recompute
    bias, wv = mm.image_model_weights()
    meta = {r["image_id"]: r for r in w.images.slice(0, 3).to_pylist()}
    sub = df.set_index("image_id")
    from doonop_ray.ops.common import r4

    for iid, r in meta.items():
        pix = decode_image(r["bytes"], r["fmt"])
        want = float(r4(mm.ImageModelScorer.score_of(
            pix, bias, wv, mm._IMG_MODEL_SIZE)))
        assert float(sub.loc[iid, "score"]) == want
    assert image_model_score_violations(SF).empty


def test_image_model_check_tamper(ray_session, monkeypatch):
    from doonop_ray.ops import checks as ck

    good = mm.score_images_model(SF)

    def bad(sf_dir):
        out = good.copy()
        out.loc[0, "score"] = 1.5  # out of range AND wrong vs recompute
        return out

    monkeypatch.setattr(mm, "score_images_model", bad)
    kinds = set(ck.image_model_score_violations(SF)["kind"])
    assert "range_or_keep" in kinds


def test_caption_image_alignment_pinned(ray_session):
    """Dual-encoder alignment: one row per world image, scores pinned
    against a direct recompute, cross-modal sensitivity (a swapped
    caption changes the score for at least one probe pair), check
    empty."""
    from doonop_ray.codec import decode_image
    from doonop_ray.ops.checks import caption_alignment_violations
    from doonop_ray.ops.common import r4
    from doonop_ray.pipelines.flagship import world_for

    df = mm.caption_image_alignment(SF)
    w = world_for(SF)
    assert len(df) == w.images.num_rows
    assert df["alignment"].between(-1, 1).all()
    assert (df["keep"] == (df["alignment"] >= mm.ALIGN_KEEP_MIN)).all()

    proj = mm.alignment_proj()
    rows = [r for r in w.images.slice(0, 3).to_pylist()]
    sub = df.set_index("image_id")
    for r in rows:
        pix = decode_image(r["bytes"], r["fmt"])
        want = float(r4(mm.CaptionAlignmentScorer.alignment_of(
            pix, r["caption"], proj)))
        assert float(sub.loc[r["image_id"], "alignment"]) == want
    # cross-modal sensitivity, both towers: swapping the CAPTION under
    # a fixed image moves the score (text tower live), and swapping the
    # IMAGE under a fixed caption moves it too (image tower live) — the
    # one-sided OR form would pass even with a dead image tower
    pix0 = decode_image(rows[0]["bytes"], rows[0]["fmt"])
    pix1 = decode_image(rows[1]["bytes"], rows[1]["fmt"])
    a00 = mm.CaptionAlignmentScorer.alignment_of(pix0, rows[0]["caption"], proj)
    a01 = mm.CaptionAlignmentScorer.alignment_of(pix0, rows[1]["caption"], proj)
    a11 = mm.CaptionAlignmentScorer.alignment_of(pix1, rows[1]["caption"], proj)
    assert a01 != a00  # caption swap moves the score
    assert a01 != a11  # image swap moves the score
    assert caption_alignment_violations(SF).empty


def test_caption_alignment_check_tamper(ray_session, monkeypatch):
    from doonop_ray.ops import checks as ck

    good = mm.caption_image_alignment(SF)

    def bad(sf_dir):
        out = good.copy()
        out.loc[0, "alignment"] = 1.5  # out of range AND wrong vs recompute
        return out

    monkeypatch.setattr(mm, "caption_image_alignment", bad)
    kinds = set(ck.caption_alignment_violations(SF)["kind"])
    assert "range_or_keep" in kinds


def test_caption_alignment_check_nan_and_dup(ray_session, monkeypatch):
    """NaN scores must not slip through the positive-form range gate,
    and a duplicated id (first sorted id is always in the stride
    sample) must be REPORTED, not crash the recompute compare."""
    from doonop_ray.ops import checks as ck

    good = mm.caption_image_alignment(SF)

    def bad(sf_dir):
        out = good.copy()
        out.loc[1, "alignment"] = float("nan")  # keep stays False
        out.loc[1, "keep"] = False
        return pd.concat([out.iloc[:1], out], ignore_index=True)  # dup row 0

    monkeypatch.setattr(mm, "caption_image_alignment", bad)
    kinds = set(ck.caption_alignment_violations(SF)["kind"])
    assert "range_or_keep" in kinds  # the NaN row
    assert "dup_id" in kinds


def test_image_sharpness_pinned(ray_session):
    """Laplacian-variance focus measure: one row per world image, both
    features pinned against a direct recompute, both keep branches
    exercised on this world, check empty."""
    from doonop_ray.codec import decode_image
    from doonop_ray.ops.checks import image_sharpness_violations
    from doonop_ray.ops.common import r4
    from doonop_ray.pipelines.flagship import world_for

    df = mm.image_sharpness(SF)
    w = world_for(SF)
    assert len(df) == w.images.num_rows
    assert (df["sharpness"] >= 0).all()
    assert df["edge_ratio"].between(0, 1).all()
    assert (df["keep"] == (df["sharpness"] >= mm.SHARP_KEEP_MIN)).all()
    assert df["keep"].any() and (~df["keep"]).any()  # gate discriminates

    sub = df.set_index("image_id")
    for r in w.images.slice(0, 3).to_pylist():
        pix = decode_image(r["bytes"], r["fmt"])
        s, e = mm.ImageSharpnessStage.sharpness_of(pix)
        assert float(sub.loc[r["image_id"], "sharpness"]) == float(r4(s))
        assert float(sub.loc[r["image_id"], "edge_ratio"]) == float(r4(e))
    assert image_sharpness_violations(SF).empty


def test_image_sharpness_check_tamper(ray_session, monkeypatch):
    from doonop_ray.ops import checks as ck

    good = mm.image_sharpness(SF)

    def bad(sf_dir):
        out = good.copy()
        out = out.drop(index=out.index[:1])  # drop a row -> id-set gap
        return out

    monkeypatch.setattr(mm, "image_sharpness", bad)
    kinds = set(ck.image_sharpness_violations(SF)["kind"])
    assert "id_set_mismatch" in kinds


def test_sharpness_flat_image_scores_zero():
    """A constant image has zero Laplacian everywhere -> (0, 0); a 2x2
    image has an empty interior -> (0, 0) by convention."""
    flat = np.full((8, 8, 3), 99, np.uint8)
    assert mm.ImageSharpnessStage.sharpness_of(flat) == (0.0, 0.0)
    tiny = np.zeros((2, 2, 3), np.uint8)
    assert mm.ImageSharpnessStage.sharpness_of(tiny) == (0.0, 0.0)


def test_alignment_empty_caption_scores_zero():
    """The zero text embedding (empty caption) makes alignment exactly
    0.0 regardless of the image."""
    pix = np.random.default_rng(1).integers(
        0, 255, (16, 16, 3)).astype(np.uint8)
    assert mm.CaptionAlignmentScorer.alignment_of(
        pix, "", mm.alignment_proj()) == 0.0


def test_image_text_retrieval_pinned(ray_session):
    """Retrieval eval: one row per sampled image, ranks in [1, Q] with
    consistent hit flags, full-recompute check empty, and the ranking
    rule pinned on a hand-built score matrix."""
    from doonop_ray.ops.checks import retrieval_eval_violations
    from doonop_ray.pipelines.flagship import world_for

    df = mm.image_text_retrieval(SF)
    w = world_for(SF)
    picked = mm._retrieval_sample(w, mm._RETRIEVAL_Q)
    assert sorted(df["image_id"]) == picked
    q = len(picked)
    assert df["rank"].between(1, q).all()
    assert (df["hit1"] == (df["rank"] == 1)).all()
    assert (df["hit5"] == (df["rank"] <= 5)).all()
    assert retrieval_eval_violations(SF).empty

    # ranking rule: identity towers -> everything retrieves at rank 1;
    # an adversarial matrix pins the optimistic tie handling
    eye = np.eye(3)
    assert list(mm.retrieval_ranks(eye, eye)) == [1, 1, 1]
    img = np.array([[1.0, 0.0], [0.0, 1.0]])
    txt = np.array([[0.0, 1.0], [0.0, 1.0]])  # txt0 == txt1: tie
    # scores row0 = [0, 0] -> tie with own -> optimistic rank 1;
    # row1 = [1, 1] -> tie -> rank 1
    assert list(mm.retrieval_ranks(img, txt)) == [1, 1]
    txt2 = np.array([[0.0, 1.0], [1.0, 0.0]])  # true caption strictly worse
    # row0: own=txt0 score 0, other=1 -> rank 2
    assert list(mm.retrieval_ranks(img, txt2)) == [2, 2]


def test_retrieval_check_tamper(ray_session, monkeypatch):
    from doonop_ray.ops import checks as ck

    good = mm.image_text_retrieval(SF)

    def bad(sf_dir):
        out = good.copy()
        # corrupt a rank but keep flags consistent -> only the full
        # recompute can catch it
        out.loc[0, "rank"] = max(2, int(out.loc[0, "rank"]) % 5 + 2)
        out.loc[0, "hit1"] = False
        out.loc[0, "hit5"] = bool(out.loc[0, "rank"] <= 5)
        return out

    monkeypatch.setattr(mm, "image_text_retrieval", bad)
    kinds = set(ck.retrieval_eval_violations(SF)["kind"])
    assert "rank" in kinds


def test_curate_image_text_pairs_fused(ray_session):
    """Fused pair curation: one row per world image, every fused column
    bit-equal to the corresponding individual gate query (same statics,
    same r4), keep == the gate conjunction, check empty."""
    from doonop_ray.ops.checks import pair_curation_violations
    from doonop_ray.ops.common import r4
    from doonop_ray.pipelines.flagship import world_for

    df = mm.curate_image_text_pairs(SF).set_index("image_id")
    w = world_for(SF)
    assert len(df) == w.images.num_rows

    sh = mm.image_sharpness(SF).set_index("image_id")
    assert (df["sharpness"] == sh["sharpness"]).all()
    assert (df["edge_ratio"] == sh["edge_ratio"]).all()
    sc = mm.score_images_model(SF).set_index("image_id")
    assert (df["score"] == sc["score"]).all()
    al = mm.caption_image_alignment(SF).set_index("image_id")
    assert (df["alignment"] == al["alignment"]).all()
    cu = mm.curate_images(SF).set_index("image_id")
    assert (df["brightness"].to_numpy()
            == r4(cu["brightness"].to_numpy())).all()
    assert (df["contrast"].to_numpy()
            == r4(cu["contrast"].to_numpy())).all()
    assert (df["min_side"] == cu["min_side"].astype(float)).all()

    cols = {k: df[k].to_numpy(np.float64) for k in
            ("brightness", "contrast", "min_side", "sharpness",
             "edge_ratio", "score", "alignment")}
    assert (df["keep"].to_numpy()
            == mm.PairCurationStage.keep_mask(cols)).all()
    assert pair_curation_violations(SF).empty


def test_pair_curation_check_tamper(ray_session, monkeypatch):
    from doonop_ray.ops import checks as ck

    good = mm.curate_image_text_pairs(SF)

    def bad(sf_dir):
        out = good.copy()
        # flip one keep with features untouched -> conjunction breaks
        out.loc[0, "keep"] = not out.loc[0, "keep"]
        return out

    monkeypatch.setattr(mm, "curate_image_text_pairs", bad)
    kinds = set(ck.pair_curation_violations(SF)["kind"])
    assert "range_or_keep" in kinds


def test_recompute_kind_names_the_drifted_column(ray_session, monkeypatch):
    """A doctored feature on a SAMPLED id (keep flipped consistently so
    range_or_keep stays quiet) is flagged as recompute_<col> — the
    per-column triage label, not a blanket kind."""
    from doonop_ray.ops import checks as ck
    from doonop_ray.ops.multimodal import _retrieval_sample
    from doonop_ray.pipelines.flagship import world_for

    good = mm.image_sharpness(SF)
    iid = _retrieval_sample(world_for(SF), 64)[0]

    def bad(sf_dir):
        out = good.copy()
        i = out.index[out["image_id"] == iid][0]
        # nudge sharpness but keep it consistent with the keep rule so
        # only the recompute stage can catch it
        out.loc[i, "sharpness"] = out.loc[i, "sharpness"] + 1.0
        out.loc[i, "keep"] = out.loc[i, "sharpness"] >= mm.SHARP_KEEP_MIN
        return out

    monkeypatch.setattr(mm, "image_sharpness", bad)
    v = ck.image_sharpness_violations(SF)
    kinds = set(v["kind"])
    assert "recompute_sharpness" in kinds
    assert "recompute_edge_ratio" not in kinds  # untouched column quiet
