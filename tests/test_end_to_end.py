"""End-to-end integration: train CDRNet on the synthetic MADS tree,
checkpoint, reload, run the inference apps, verify learning + resume."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fast3dhpe_tpu.config import config_from_dict, load_config
from fast3dhpe_tpu.data.synthetic import make_synthetic_mads
from fast3dhpe_tpu.train import loop_cdr, loop2d
from fast3dhpe_tpu.train.checkpoint import load_variables


def tiny_cfg(root, dataset_type="MADS_3d", num_layers=18, batch=4,
             name="e2e_test", warmup=0, epochs=2, image=64, hm=16):
    return config_from_dict({
        "DATASET": {"TYPE": dataset_type, "ROOT": root,
                    "TRAIN_SET": "train", "TEST_SET": "valid",
                    "FLIP": True, "ROT_FACTOR": 30, "SCALE_FACTOR": 0.25,
                    "OCCLUSION": "None"},
        "MODEL": {"NUM_JOINTS": 19, "NUM_LAYERS": num_layers, "NAME": name,
                  "PRETRAINED": "", "IMAGE_SIZE": [image, image],
                  "EXTRA": {"TARGET_TYPE": "gaussian", "SIGMA": 1,
                            "HEATMAP_SIZE": [hm, hm]}},
        "TRAIN": {"BATCH_SIZE": batch, "EPOCH": epochs, "LR": 1e-3,
                  "LR_STEP": [40], "LR_FACTOR": 0.1, "WARMUP": warmup,
                  "LOSS_3D_WEIGHT": 4},
        "TEST": {"BATCH_SIZE": batch},
        "LOSS": {"USE_TARGET_WEIGHT": True, "TYPE": "JointsMSESmooth"},
    })


@pytest.fixture(scope="module")
def mads_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("mads_e2e")
    make_synthetic_mads(str(root), n_frames=8, img_w=256, img_h=192)
    return str(root)


@pytest.mark.slow
class TestTrainCDREndToEnd:
    def test_train_checkpoints_and_inference(self, mads_root, tmp_path):
        cfg = tiny_cfg(mads_root, warmup=1, epochs=3)
        weights_root = str(tmp_path / "weights")
        history = loop_cdr.run(cfg, overwrite=True,
                               weights_root=weights_root, seed=0)
        assert len(history["train_loss"]) == 3
        assert all(np.isfinite(v) for v in history["train_loss"])
        # warmup epoch trains 2D-only; post-warmup epochs add 3D
        model_dir = os.path.join(weights_root, cfg.MODEL.NAME)
        assert os.path.isdir(os.path.join(model_dir, "latest"))
        # best saved only after warmup [ref train_cdr.py:223-228]
        assert os.path.isdir(os.path.join(model_dir, "best"))

        # reload checkpoint -> inferencer predicts finite poses
        variables = load_variables(os.path.join(model_dir, "latest"))
        from fast3dhpe_tpu.models import CDRNet
        model = CDRNet.from_config(cfg)
        from fast3dhpe_tpu.data import LoadMADSData
        stream = LoadMADSData(os.path.join(mads_root, "valid"),
                              cfg.MODEL.IMAGE_SIZE, "HipHop")
        batch = next(stream.batches(4))
        from fast3dhpe_tpu.ops.warp import normalize_imagenet
        imgs = jnp.stack([normalize_imagenet(batch["img_l"]),
                          normalize_imagenet(batch["img_r"])], axis=1)
        kp, p3d = model.apply(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            imgs, jnp.asarray(batch["proj"]), train=False)
        assert np.isfinite(np.asarray(p3d)).all()

    def test_early_stop_patience(self, mads_root, tmp_path):
        # LR=0 freezes params: after the first post-warmup best the val
        # metric only drifts with BN running stats, so a tight patience
        # must end the run far before the 30-epoch schedule
        cfg = tiny_cfg(mads_root, epochs=30, name="es_test")
        cfg.TRAIN.LR = 0.0
        weights_root = str(tmp_path / "weights")
        history = loop_cdr.run(cfg, overwrite=True,
                               weights_root=weights_root, seed=0,
                               early_stop_patience=2)
        n = len(history["val_mpjpe_3d"])
        assert n < 30, "early stop never triggered"
        assert n >= 3     # >= first-best epoch + patience
        # the stop still writes the rolling checkpoint
        model_dir = os.path.join(weights_root, cfg.MODEL.NAME)
        assert os.path.isdir(os.path.join(model_dir, "latest"))
        assert os.path.isdir(os.path.join(model_dir, "best"))

    def test_refuses_overwrite_without_flag(self, mads_root, tmp_path):
        cfg = tiny_cfg(mads_root, epochs=1, name="ow_test")
        weights_root = str(tmp_path / "weights")
        loop_cdr.run(cfg, overwrite=True, weights_root=weights_root,
                     max_steps_per_epoch=1)
        with pytest.raises(FileExistsError):
            loop_cdr.run(cfg, overwrite=False, weights_root=weights_root)


@pytest.mark.slow
class TestTrain2DEndToEnd:
    def test_early_stop_patience_2d(self, mads_root, tmp_path):
        # mirrors the CDR test: frozen params (LR=0) pin val PCK after
        # the first best, so a tight patience ends the 30-epoch
        # schedule early and still writes checkpoints
        cfg = tiny_cfg(mads_root, dataset_type="MADS_2d", epochs=30,
                       name="es2d_test")
        cfg.LOSS.TYPE = "JointsMSE"
        cfg.TRAIN.LR = 0.0
        weights_root = str(tmp_path / "weights")
        history = loop2d.run(cfg, overwrite=True,
                             weights_root=weights_root, seed=0,
                             early_stop_patience=2)
        n = len(history["val_acc"])
        assert n < 30, "early stop never triggered"
        assert n >= 2
        model_dir = os.path.join(weights_root, cfg.MODEL.NAME)
        assert os.path.isdir(os.path.join(model_dir, "latest"))

    def test_mads2d_training_learns(self, mads_root, tmp_path):
        cfg = tiny_cfg(mads_root, dataset_type="MADS_2d", epochs=4,
                       name="e2e_2d")
        cfg.LOSS.TYPE = "JointsMSE"
        weights_root = str(tmp_path / "weights")
        history = loop2d.run(cfg, overwrite=True, weights_root=weights_root,
                             seed=0)
        assert len(history["train_loss"]) == 4
        # heatmap MSE should fall on this trivially-overfittable set
        assert history["train_loss"][-1] < history["train_loss"][0]
        assert os.path.isdir(
            os.path.join(weights_root, "e2e_2d", "best"))


@pytest.mark.slow
class TestInferenceApps:
    def test_baseline_app_runs(self, mads_root, tmp_path):
        cfg = tiny_cfg(mads_root, dataset_type="MADS_2d", epochs=8,
                       name="base_app")
        cfg.LOSS.TYPE = "JointsMSE"
        weights_root = str(tmp_path / "weights")
        loop2d.run(cfg, overwrite=True, weights_root=weights_root,
                   seed=0)

        from fast3dhpe_tpu.apps.baseline import BaselineEstimator
        from fast3dhpe_tpu.data import LoadMADSData
        est = BaselineEstimator(cfg, weights_root=weights_root)
        stream = LoadMADSData(os.path.join(mads_root, "valid"),
                              cfg.MODEL.IMAGE_SIZE, "HipHop")
        e2, e3 = est.evaluate_movement(stream, batch_size=4)
        assert np.isfinite(e2) and np.isfinite(e3)

        # the TRAINED checkpoint must carry signal end-to-end through
        # the hard-argmax + closed-form-triangulation pipeline: swap in
        # random-init weights and the 2D error must get worse (the
        # head-to-head evidence at scale is scripts/head_to_head.py;
        # this guards the app path itself on a trained checkpoint)
        import jax
        trained = est.variables
        rand = est.model.init(jax.random.PRNGKey(99),
                              np.zeros((1, *cfg.MODEL.IMAGE_SIZE, 3),
                                       np.float32), train=False)
        est.variables = {"params": rand["params"],
                         "batch_stats": rand["batch_stats"]}
        e2_rand, _ = est.evaluate_movement(stream, batch_size=4)
        est.variables = trained
        assert e2 < e2_rand, (e2, e2_rand)

        # reference baseline's render/GIF flow [ref: baseline.py:85-137]
        from fast3dhpe_tpu.utils import save_gif
        out_jpg = str(tmp_path / "base_test.jpg")
        frames = est.render_frames(stream, 2, out_jpg=out_jpg,
                                   batch_size=4)
        assert len(frames) == 2 and os.path.isfile(out_jpg)
        gif = str(tmp_path / "HipHop_base.gif")
        save_gif(frames, gif)
        assert os.path.isfile(gif)

    def test_cdr_inferencer_app(self, mads_root, tmp_path):
        cfg = tiny_cfg(mads_root, epochs=2, warmup=0, name="cdr_app")
        weights_root = str(tmp_path / "weights")
        loop_cdr.run(cfg, overwrite=True, weights_root=weights_root,
                     max_steps_per_epoch=2)

        from fast3dhpe_tpu.apps.inference import CDRNetInferencer
        from fast3dhpe_tpu.data import LoadMADSData
        inf = CDRNetInferencer(cfg, weights_root=weights_root)
        stream = LoadMADSData(os.path.join(mads_root, "valid"),
                              cfg.MODEL.IMAGE_SIZE, "HipHop")
        e2, e3 = inf.evaluate_movement(stream, batch_size=4)
        assert np.isfinite(e2) and np.isfinite(e3)


@pytest.mark.slow
class TestStagedProtocol:
    def test_2d_pretrain_then_encoder_transfer_into_cdr(self, mads_root,
                                                        tmp_path):
        """The reference's staged recipe [ref: train_cdr.py:46-49,
        models/poseresnet.py:23-38]: 2D backbone train -> PRETRAINED
        (native orbax dir) -> encoder-only merge -> CDR fine-tune.
        Asserts the encoder weights actually transferred and the decoder
        did not."""
        cfg2d = tiny_cfg(mads_root, dataset_type="MADS_2d", epochs=1,
                         name="staged_2d")
        cfg2d.LOSS.TYPE = "JointsMSE"
        weights_root = str(tmp_path / "weights")
        loop2d.run(cfg2d, overwrite=True, weights_root=weights_root,
                   max_steps_per_epoch=2)
        ckpt = os.path.join(weights_root, "staged_2d", "latest")
        assert os.path.isdir(ckpt)

        # unit check: the merge the CDR loop performs is encoder-exact
        # and leaves the decoder fresh [ref: models/cdrnet.py:103-118]
        from fast3dhpe_tpu.train.checkpoint import merge_encoder_only
        from fast3dhpe_tpu.models import CDRNet
        pre = load_variables(ckpt)
        cfg3d = tiny_cfg(mads_root, epochs=2, warmup=1, name="staged_3d")
        cfg3d.MODEL.PRETRAINED = ckpt
        model = CDRNet.from_config(cfg3d)
        imgs = jnp.zeros((1, 2, 64, 64, 3), jnp.float32)
        proj = jnp.broadcast_to(
            jnp.asarray([[600.0, 0, 32, 0], [0, 600.0, 32, 0],
                         [0, 0, 1, 3000.0]], jnp.float32), (1, 2, 3, 4))
        fresh = model.init(jax.random.PRNGKey(0), imgs, proj, train=False)
        merged = merge_encoder_only(fresh, pre)
        for a, b in zip(jax.tree_util.tree_leaves(
                            merged["params"]["encoder"]),
                        jax.tree_util.tree_leaves(
                            pre["params"]["encoder"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        dec_same = all(
            np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree_util.tree_leaves(merged["params"]["decoder"]),
                jax.tree_util.tree_leaves(pre["params"]["decoder"])))
        assert not dec_same, "decoder should stay freshly initialized"

        # loop check: fine-tune runs finite, and the saved encoder's big
        # conv kernels stay near the pretrained ones (a fresh re-init
        # would be ~sqrt(2) relative distance; a few tiny Adam steps move
        # ~1e-3/element)
        history = loop_cdr.run(cfg3d, overwrite=True,
                               weights_root=weights_root,
                               max_steps_per_epoch=2)
        assert all(np.isfinite(v) for v in history["train_loss"])
        post = load_variables(os.path.join(weights_root, "staged_3d",
                                           "latest"))
        pre_l = jax.tree_util.tree_leaves(pre["params"]["encoder"])
        post_l = jax.tree_util.tree_leaves(post["params"]["encoder"])
        rels = [float(np.linalg.norm(np.asarray(a) - np.asarray(b))
                      / (np.linalg.norm(np.asarray(a)) + 1e-9))
                for a, b in zip(pre_l, post_l)
                if np.asarray(a).size > 1000]    # conv kernels only
        assert rels and max(rels) < 0.5, \
            f"encoder does not look transferred (max rel {max(rels):.3f})"


class TestConfigs:
    def test_reference_configs_load(self):
        for name in ("mpii", "mads_2d", "mads_3d"):
            cfg = load_config(f"configs/{name}.yaml")
            assert cfg.MODEL.NUM_LAYERS == 101
        cfg = load_config("configs/mads_3d.yaml")
        assert cfg.TRAIN.WARMUP == 20
        assert cfg.TRAIN.LOSS_3D_WEIGHT == 4
        assert cfg.DATASET.OCCLUSION == "CUTOUT"
        assert cfg.LOSS.TYPE == "JointsMSESmooth"


@pytest.mark.slow
class TestConvergesToAbsoluteAccuracy:
    def test_synthetic_rig_mpjpe_bound(self, tmp_path):
        """Longer converging run asserting an ABSOLUTE 3D accuracy bound
        on the synthetic rig (round-1 gap: only loss-decrease was ever
        asserted). Calibration (recorded in BASELINE.md): this exact
        setup reaches ~2.0-2.2m best val MPJPE by epoch 8 and ~1.87m by
        epoch 12 (CDRNet-18 at 64px/16px heatmaps is a deliberately tiny
        proxy; its 3D resolution limit, not the pipeline, sets the
        floor). The bound (3m, vs ~48,000m untrained) is diagnostic of
        real 2D->3D convergence through fusion + soft-argmax + DLT."""
        root = str(tmp_path / "mads")
        make_synthetic_mads(root, n_frames=8, img_w=256, img_h=192)
        cfg = tiny_cfg(root, warmup=3, epochs=8, name="acc_bound")
        h = loop_cdr.run(cfg, overwrite=True,
                         weights_root=str(tmp_path / "w"), seed=0)
        best = min(h["val_mpjpe_3d"])
        assert best < 3000.0, h["val_mpjpe_3d"]
        # and the first post-warmup epoch must already be out of the
        # triangulate-at-infinity regime
        assert h["val_mpjpe_3d"][-1] < 100000.0


@pytest.mark.slow
class TestDeferredBestCheckpoint:
    def test_best_written_at_boundary_holds_best_epoch_state(
            self, mads_root, tmp_path):
        """With checkpoint_every=N, "best" improvements between
        boundaries are held as on-device references (fetching a
        101-depth state is ~540 MB on the relay) and written at the
        boundary. The written best must carry the BEST epoch's metric
        and step, not the final epoch's."""
        import orbax.checkpoint as ocp
        cfg = tiny_cfg(mads_root, dataset_type="MADS_2d", epochs=4,
                       name="defer_best")
        cfg.LOSS.TYPE = "JointsMSE"
        weights_root = str(tmp_path / "weights")
        h = loop2d.run(cfg, overwrite=True, weights_root=weights_root,
                       seed=0, checkpoint_every=4)
        best_dir = os.path.join(weights_root, "defer_best", "best")
        assert os.path.isdir(best_dir), \
            "deferred best never flushed at the checkpoint boundary"
        with ocp.StandardCheckpointer() as c:
            tree = c.restore(os.path.abspath(best_dir))
        best_epoch = int(np.argmax(h["val_acc"]))
        steps_per_epoch = 2  # 8 samples / batch 4
        assert float(tree["best_metric"]) == pytest.approx(
            max(h["val_acc"]), abs=1e-6)
        assert int(tree["step"]) == (best_epoch + 1) * steps_per_epoch, \
            "saved best is not the best epoch's state"


@pytest.mark.slow
class TestResume:
    def test_resume_continues_from_checkpoint(self, mads_root, tmp_path):
        """Run 2 epochs, resume, run to 4 — step counter and params carry
        over (true resume; the reference cannot do this)."""
        cfg = tiny_cfg(mads_root, dataset_type="MADS_2d", epochs=4,
                       name="resume_t")
        cfg.LOSS.TYPE = "JointsMSE"
        weights_root = str(tmp_path / "weights")
        h1 = loop2d.run(cfg, overwrite=True, weights_root=weights_root,
                        max_epochs=2, seed=0)
        assert len(h1["train_loss"]) == 2
        h2 = loop2d.run(cfg, weights_root=weights_root, resume=True, seed=0)
        # epochs 2..3 remain
        assert len(h2["train_loss"]) == 2
        # resumed training continues to improve over the first run's end
        assert h2["train_loss"][-1] < h1["train_loss"][0]

        from fast3dhpe_tpu.train.checkpoint import restore_checkpoint
        import orbax.checkpoint as ocp
        with ocp.StandardCheckpointer() as c:
            tree = c.restore(os.path.abspath(
                os.path.join(weights_root, "resume_t", "latest")))
        steps_per_epoch = 2  # 8 samples / batch 4
        assert int(tree["step"]) == 4 * steps_per_epoch
