"""Export/serving surface (gea.cli.export_model + gea.serve): a trained run
round-trips through serialized StableHLO — the artifact reproduces the live
model bit-for-intent, serves any batch size via the symbolic batch dim, and
carries the D realism scores for error-avoidance serving (reference C13)."""

import json
import os

import numpy as np
import pytest

TINY = [
    "--dataset", "synthetic", "--image_size", "16", "--code_size", "16",
    "--num_features", "4", "--max_features", "16", "--batch_size", "4",
    "--dtype", "float32", "--log_interval", "1", "--vis_rows", "2",
    "--num_devices", "1", "--r_iterations", "1", "--niter", "2",
    "--vis_interval", "2", "--save_interval", "2",
]


@pytest.fixture(scope="module")
def glis_run(tmp_path_factory):
    from gea.cli import train_glis

    run = str(tmp_path_factory.mktemp("export") / "g")
    train_glis.main(TINY + ["--save_path", run])
    return run


@pytest.mark.slow
def test_export_roundtrip_symbolic_batch(glis_run, tmp_path):
    from gea import serve
    from gea.cli import export_model

    out = str(tmp_path / "art")
    export_model.main(
        ["--load_path", glis_run, "--out", out, "--with_scores", "1",
         "--all_stages", "1", "--platforms", "cpu"]
    )
    assert os.path.exists(os.path.join(out, serve.ARTIFACT))
    with open(os.path.join(out, serve.MANIFEST)) as f:
        manifest = json.load(f)
    assert manifest["code_size"] == 16
    assert manifest["outputs"] == ["images", "stages", "scores"]
    assert manifest["batch"] == 0  # symbolic
    assert manifest["step"] == 2

    model = serve.load(out)
    # two different batch sizes through ONE artifact
    for n in (2, 5):
        z = np.random.default_rng(n).standard_normal((n, 16)).astype(np.float32)
        got = model(z)
        assert got["images"].shape == (n, 16, 16, 3)
        assert got["images"].dtype == np.uint8
        assert got["stages"].shape[0] == manifest["n_stages"]
        assert got["scores"].shape == (n,)
        assert np.all((got["scores"] >= 0) & (got["scores"] <= 1))

    # the artifact matches the live flax render (selfcheck already asserted
    # <=1 uint8; verify independently here against load_generator)
    from gea.cli.sample import load_generator
    import jax.numpy as jnp

    generator, g_vars, _ = load_generator(glis_run)
    z = np.random.default_rng(7).standard_normal((3, 16)).astype(np.float32)
    live, _ = generator.render(g_vars, jnp.asarray(z))
    want = np.clip((np.asarray(live[-1]) + 1) * 127.5, 0, 255).astype(np.uint8)
    got = model(z)["images"]
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

    # convenience sampler: count not divisible by batch_size
    s = model.sample(6, seed=1, batch_size=4)
    assert s["images"].shape == (6, 16, 16, 3)
    assert s["stages"].shape[1] == 6

    # input validation
    with pytest.raises(ValueError):
        model(z[:, :8])
    with pytest.raises(ValueError):
        model(z, np.zeros((3, 4, 4, 2), np.float32))
    with pytest.raises(ValueError):
        model.sample(0)
    # a lone artifact without its manifest is rejected at load time (the
    # manifest carries the call contract)
    with pytest.raises(FileNotFoundError, match="manifest"):
        lone = tmp_path / "lone"
        lone.mkdir()
        (lone / serve.ARTIFACT).write_bytes(
            (tmp_path / "art" / serve.ARTIFACT).read_bytes()
        )
        serve.load(str(lone))

    # deployment-side CLI: grid + scores straight from the artifact
    cli_out = str(tmp_path / "cli")
    serve._main([str(tmp_path / "art"), "--count", "5", "--batch_size", "3",
                 "--rows", "2", "--out", cli_out])
    assert sorted(os.listdir(cli_out)) == ["samples.png", "scores.json"]
    with open(os.path.join(cli_out, "scores.json")) as f:
        assert len(json.load(f)) == 5


@pytest.mark.slow
def test_export_n_stages_without_initial_image(tmp_path):
    """The exported program renders via generator.render(), which ALWAYS
    includes the initial pre-LIS image — the manifest must count what the
    artifact actually emits, not generator.n_stages (regression:
    include_initial_image=False runs undercounted by one)."""
    from gea import serve
    from gea.cli import export_model, train_glis

    run = str(tmp_path / "g_noinit")
    train_glis.main(
        TINY + ["--include_initial_image", "false", "--save_path", run]
    )
    out = str(tmp_path / "art_noinit")
    export_model.main(
        ["--load_path", run, "--out", out, "--all_stages", "1",
         "--platforms", "cpu", "--selfcheck", "0"]
    )
    model = serve.load(out)
    z = np.random.default_rng(0).standard_normal((2, 16)).astype(np.float32)
    got = model(z)
    # r_iterations=1, no initial image: generator.n_stages == 1, but the
    # render emits 2 stages — manifest must say 2.
    assert got["stages"].shape[0] == 2
    assert model.manifest["n_stages"] == got["stages"].shape[0]


@pytest.mark.slow
def test_stream_pipelined_matches_sequential(glis_run, tmp_path):
    """stream() is the production serving path: same results as
    one-at-a-time __call__, order preserved, mixed batch sizes through
    the symbolic batch dim, and the tail drains after the input ends."""
    from gea import serve
    from gea.cli import export_model

    out = str(tmp_path / "art_stream")
    export_model.main(
        ["--load_path", glis_run, "--out", out, "--with_scores", "1",
         "--all_stages", "1", "--platforms", "cpu", "--selfcheck", "0"]
    )
    model = serve.load(out)
    rng = np.random.default_rng(3)
    batches = [
        rng.standard_normal((n, 16)).astype(np.float32) for n in (2, 5, 1, 4)
    ]
    streamed = list(model.stream(iter(batches), depth=2))
    assert len(streamed) == len(batches)
    for z, got in zip(batches, streamed):
        want = model(z)
        assert got["images"].shape[0] == z.shape[0]  # order preserved
        for k in want:
            np.testing.assert_array_equal(got[k], want[k])

    # validation surfaces inside the generator
    with pytest.raises(ValueError):
        list(model.stream(iter([batches[0][:, :8]])))
    with pytest.raises(ValueError):
        list(model.stream(iter([(batches[0], np.zeros((2, 4, 4, 2)))])))
    with pytest.raises(ValueError):
        list(model.stream(iter(batches), depth=0))


def test_stream_in_flight_bound():
    """stream(depth=D) keeps at most D batches in flight: with lazy
    iteration, exactly D render calls happen before the first yield."""
    from gea import serve

    calls = []

    class StubExported:
        def call(self, z):
            calls.append(z.shape[0])
            return {"images": z}

    model = serve.ServingModel(StubExported(), {"code_size": 4, "batch": 0})
    batches = [np.zeros((i + 1, 4), np.float32) for i in range(5)]
    gen = model.stream(iter(batches), depth=2)
    first = next(gen)
    assert len(calls) == 2  # not 3: retire-before-enqueue bounds the window
    assert first["images"].shape[0] == 1  # order preserved
    rest = list(gen)
    assert len(calls) == 5 and [r["images"].shape[0] for r in rest] == [2, 3, 4, 5]


@pytest.mark.slow
def test_export_pinned_batch_and_spatial_noise(tmp_path):
    from gea import serve
    from gea.cli import export_model, train_glis

    run = str(tmp_path / "g_sn")
    train_glis.main(TINY + ["--spatial_code", "2", "--save_path", run])

    out = str(tmp_path / "art_sn")
    export_model.main(
        ["--load_path", run, "--out", out, "--with_scores", "0",
         "--platforms", "cpu", "--batch", "4"]
    )
    model = serve.load(out)
    assert model.spatial_noise_shape is not None
    b, *sn_shape = (4, *model.spatial_noise_shape)
    rng = np.random.default_rng(0)
    z = rng.standard_normal((b, 16)).astype(np.float32)
    sn = rng.standard_normal((b, *sn_shape)).astype(np.float32)
    got = model(z, sn)
    assert got["images"].shape == (4, 16, 16, 3)
    assert "scores" not in got

    # pinned batch: wrong size and missing spatial noise both rejected
    with pytest.raises(ValueError):
        model(z[:2], sn[:2])
    with pytest.raises(ValueError):
        model(z)

    # sample() respects the pinned batch and trims to count
    s = model.sample(6, seed=2)
    assert s["images"].shape == (6, 16, 16, 3)


@pytest.mark.slow
def test_export_with_baked_r_correction(glis_run, tmp_path):
    """--r_path bakes the R-separate correction chain into the artifact:
    output matches blend_correction-then-render computed live, and the
    frozen-G run is picked up from the R run's config (no --load_path)."""
    from gea import serve
    from gea.cli import export_model, train_r_separate

    r_dir = str(tmp_path / "r")
    train_r_separate.main(
        TINY + ["--g_path", glis_run, "--r_hidden", "8",
                "--save_path", r_dir]
    )

    out = str(tmp_path / "art_r")
    export_model.main(
        ["--r_path", r_dir, "--out", out, "--platforms", "cpu",
         "--correction_steps", "2", "--correction_strength", "0.4",
         "--with_scores", "0"]
    )
    model = serve.load(out)
    corr = model.manifest["correction"]
    assert corr["steps"] == 2 and corr["strength"] == 0.4
    assert corr["shell_renorm"] is True

    import jax.numpy as jnp
    from gea.cli.sample import load_generator
    from gea.cli.sample_r_separate import load_reverter
    from gea.models.reverter import blend_correction

    z = np.random.default_rng(5).standard_normal((3, 16)).astype(np.float32)
    got = model(z)["images"]

    generator, g_vars, _ = load_generator(glis_run)
    reverter, r_vars, _ = load_reverter(r_dir)
    zc = jnp.asarray(z)
    for _ in range(2):
        imgs, _ = generator.render(g_vars, zc)
        zc = blend_correction(zc, reverter.apply(r_vars, imgs[-1], train=False), 0.4)
    imgs, _ = generator.render(g_vars, zc)
    want = np.clip((np.asarray(imgs[-1]) + 1) * 127.5, 0, 255).astype(np.uint8)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

    # the corrected artifact is not the plain render (the chain engaged)
    plain, _ = generator.render(g_vars, jnp.asarray(z))
    plain = np.clip((np.asarray(plain[-1]) + 1) * 127.5, 0, 255).astype(np.uint8)
    assert np.abs(got.astype(int) - plain.astype(int)).max() > 1


@pytest.mark.slow
def test_export_r_iterative_chain(tmp_path):
    """--ri_path exports the jointly-trained G/D/R iterative chain: the
    per-link `stages` output matches the sampler's iterative_chain and
    `images` is the chain end."""
    from gea import serve
    from gea.cli import export_model, train_r_iterative

    ri_dir = str(tmp_path / "ri")
    train_r_iterative.main(
        TINY + ["--r_chain_length", "2", "--r_hidden", "8",
                "--save_path", ri_dir]
    )

    out = str(tmp_path / "art_ri")
    export_model.main(
        ["--ri_path", ri_dir, "--out", out, "--platforms", "cpu",
         "--all_stages", "1"]
    )
    model = serve.load(out)
    assert model.manifest["chain"] == {"links": 2, "trained_links": 2}
    assert model.manifest["n_stages"] == 3

    z = np.random.default_rng(9).standard_normal((4, 16)).astype(np.float32)
    got = model(z)
    assert got["stages"].shape == (3, 4, 16, 16, 3)
    assert got["scores"].shape == (4,)
    np.testing.assert_array_equal(got["stages"][-1], got["images"])

    import jax.numpy as jnp
    from gea.config import TrainRIterativeConfig
    from gea.models import GeneratorLIS, Reverter
    from gea.models.reverter import iterative_chain
    from gea.utils.checkpoint import restore_checkpoint

    cfg = TrainRIterativeConfig.load(os.path.join(ri_dir, "config.json"))
    restored = restore_checkpoint(ri_dir, target=None)
    generator = GeneratorLIS.from_config(cfg, r_iterations=0)
    reverter = Reverter.from_config(cfg)
    g_vars = {"params": restored["params_g"], **(restored.get("extras_g") or {})}
    r_vars = {"params": restored["params_r"], **(restored.get("extras_r") or {})}
    want = iterative_chain(
        generator, reverter, g_vars, r_vars, jnp.asarray(z), None, 2
    )
    want = np.clip((np.asarray(want) + 1) * 127.5, 0, 255).astype(np.uint8)
    assert np.abs(got["stages"].astype(int) - want.astype(int)).max() <= 1

    # mutual exclusivity guard
    with pytest.raises(SystemExit):
        export_model.main(
            ["--ri_path", ri_dir, "--load_path", ri_dir, "--out", out]
        )


@pytest.mark.slow
def test_sharded_serving_matches_single_device(glis_run, tmp_path):
    """ServingModel.sharded(): the SAME single-device artifact executed
    across the 8-virtual-device mesh with the batch sharded must be
    bit-identical to the single-device path, including the zero-pad/trim
    route for batches not divisible by the device count."""
    import jax

    from gea import serve
    from gea.cli import export_model

    out = str(tmp_path / "art")
    export_model.main(
        ["--load_path", glis_run, "--out", out, "--with_scores", "1",
         "--all_stages", "1", "--platforms", "cpu"]
    )
    model = serve.load(out)
    sharded = model.sharded()
    assert len(sharded.devices) == len(jax.devices())

    rng = np.random.default_rng(11)
    for n in (16, 5):  # divisible and pad-needing batch sizes
        z = rng.standard_normal((n, 16)).astype(np.float32)
        want = model(z)
        got = sharded(z)
        assert got["images"].shape == (n, 16, 16, 3)
        assert np.array_equal(got["images"], want["images"])
        assert np.array_equal(got["stages"], want["stages"])
        assert np.allclose(got["scores"], want["scores"], atol=1e-5)

    # sample() routes through the sharded program too
    s = sharded.sample(6, seed=1, batch_size=4)
    assert s["images"].shape == (6, 16, 16, 3)

    # pinned-batch divisibility guard
    model.manifest["batch"] = len(jax.devices()) + 1
    with pytest.raises(ValueError, match="divisible"):
        model.sharded()
    model.manifest["batch"] = 0


@pytest.mark.slow
def test_sample_filtered_error_avoidance(glis_run, tmp_path, capsys):
    """Error-avoidance serving (reference C13 at the deployment surface):
    sample_filtered keeps the top-count candidates by bundled-D score,
    exactly matching a hand-selected top-k over the same candidate draw;
    threshold mode redraws and reports a shortfall honestly."""
    from gea import serve
    from gea.cli import export_model

    out = str(tmp_path / "art")
    export_model.main(
        ["--load_path", glis_run, "--out", out, "--with_scores", "1",
         "--all_stages", "1", "--platforms", "cpu", "--selfcheck", "0"]
    )
    model = serve.load(out)

    # Top-k mode == exact top-k of the identical candidate draw.
    got = model.sample_filtered(6, seed=3, oversample=3, batch_size=4)
    cand = model.sample(18, seed=3, batch_size=4)
    want = np.sort(cand["scores"])[::-1][:6]
    np.testing.assert_allclose(got["scores"], want, rtol=1e-6)
    assert got["images"].shape == (6, 16, 16, 3)
    assert got["stages"].shape[1] == 6
    # images travel with their scores: re-score check via exact match
    # against the candidate at the same rank
    top_idx = np.argsort(cand["scores"])[::-1][:6]
    np.testing.assert_array_equal(got["images"], cand["images"][top_idx])

    # Impossible threshold: bounded rounds, shortfall filled + reported.
    got = model.sample_filtered(
        4, seed=0, oversample=2, batch_size=4, threshold=1.1, max_rounds=2
    )
    assert got["images"].shape[0] == 4
    assert "filling from the best rejects" in capsys.readouterr().out

    # Achievable threshold: everything returned clears it.
    floor = float(np.median(cand["scores"]))
    got = model.sample_filtered(
        4, seed=1, oversample=3, batch_size=4, threshold=floor
    )
    assert (got["scores"] >= floor).all()

    # Validation: bad args + artifact without scores.
    with pytest.raises(ValueError):
        model.sample_filtered(0)
    with pytest.raises(ValueError):
        model.sample_filtered(4, oversample=0)
    with pytest.raises(ValueError):
        model.sample_filtered(4, threshold=0.5, max_rounds=0)

    # Non-BCE artifacts: absolute threshold warns (uncalibrated margins,
    # ADVICE r2 contract mirrored from gea.cli.sample); top-k stays quiet.
    model.manifest["gan_loss"] = "hinge"
    capsys.readouterr()
    model.sample_filtered(2, seed=5, oversample=2, batch_size=4,
                          threshold=0.5, max_rounds=1)
    assert "sigmoid(margin)" in capsys.readouterr().out
    model.sample_filtered(2, seed=5, oversample=2, batch_size=4)
    assert "calibrated" not in capsys.readouterr().out
    model.manifest["gan_loss"] = "bce"

    # CLI: filter modifiers without --d_filter are refused, not ignored.
    with pytest.raises(SystemExit, match="d_filter"):
        serve._main([out, "--count", "4", "--d_threshold", "0.5"])
    out_ns = str(tmp_path / "art_noscores")
    export_model.main(
        ["--load_path", glis_run, "--out", out_ns, "--platforms", "cpu",
         "--selfcheck", "0", "--with_scores", "0"]
    )
    with pytest.raises(ValueError, match="with_scores"):
        serve.load(out_ns).sample_filtered(4)

    # CLI surface: --d_filter writes the kept (sorted-desc) scores.
    cli_out = str(tmp_path / "cli_filtered")
    serve._main([out, "--count", "5", "--batch_size", "4", "--rows", "5",
                 "--d_filter", "1", "--oversample", "2", "--out", cli_out])
    with open(os.path.join(cli_out, "scores.json")) as f:
        scores = json.load(f)
    assert len(scores) == 5 and scores == sorted(scores, reverse=True)
