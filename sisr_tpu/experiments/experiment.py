"""Config-driven experiment runner: train / eval / test / resume.

Lifecycle parity with reference experiments/experiment.py:25-878 —
  * data loaders per named dataset (train list, one-or-more eval/test sets)
  * model init hook (subclasses), trainable-param count logged to
    ``模型参数量.txt``
  * checkpoint contract: ``new_epoch_model.pth`` every epoch + four
    best-metric checkpoints on eval improvement (:517-537)
  * text-log contract under log_folder: loss_log.txt, lr_log.txt,
    psnr_ssim_lpips_log.txt, best_epoch_psnr_ssim_lpips_log.txt,
    train_eval_seconds_consume_log.txt, total_seconds_consume_log.txt —
    logs double as resumable state (:282-340)
  * resume: weights from new_epoch_model.pth, cosine LR reconstructed from
    start_epoch (:247-252), interrupted-eval repair (:826-833), rolling
    epoch=N snapshot folders every 5 epochs (:857-878)
  * eval/test metrics: Y-channel PSNR / SSIM (+ gaussian SSIM in test mode),
    LPIPS when weights are available; NaN metrics raise (:489-491)

TPU-native deltas: one jit-compiled train step (loss+grad+update) fed by a
thread-prefetching host loader; eval/test run fixed-tile overlap-blended
inference so arbitrary image sizes reuse one compiled program; batches can be
sharded over a device mesh for data parallelism.
"""

from __future__ import annotations

import glob
import os
import shutil
import time
from typing import Callable, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from sisr_tpu.configs.dataset_config import DatasetConfig
from sisr_tpu.configs.model_config import (ModelConfig, get_loss_function,
                                           get_optimizer, get_scheduler)
from sisr_tpu.data.dataset import DataLoader, SRDataset
from sisr_tpu.data.transforms import convert_image
from sisr_tpu.ops.metrics import psnr as psnr_fn, ssim as ssim_fn
from sisr_tpu.parallel.tiling import TiledSR
from sisr_tpu.train import checkpoint as ckpt
from sisr_tpu.train.train_state import (TrainState, create_train_state,
                                        make_train_step, set_learning_rate)
from sisr_tpu.utils.meters import AverageMeter, format_str


class Experiment:
    """Abstract experiment; subclasses implement ``init_model``."""

    # GAN experiments own the resume epoch (driven by the discriminator
    # checkpoint) and the loss/lr log writes (they append d_loss first) —
    # polymorphic hook instead of class-name string checks
    gan_mode = False

    def __init__(
        self,
        train_data_config: DatasetConfig,
        eval_data_config: DatasetConfig,
        test_data_config: DatasetConfig,
        model_config: ModelConfig,
        is_test: bool,
        # 'whole' follows the reference eval protocol (whole-image forward,
        # experiment.py:746-748) so metric logs are comparable; 'tiled' is
        # the serving path (fixed compiled shapes, arbitrary sizes)
        eval_mode: str = "whole",
        eval_tile: int = 192,
        eval_tile_overlap: int = 16,
        # pad-to-bucket for whole-image eval: round (H, W) up to multiples
        # of this, run, crop — a 30-image eval then compiles a handful of
        # programs instead of one per unique shape (multi-minute XLA
        # compiles on small hosts).  None (default) keeps the exact
        # reference protocol: this model is NOT padding-invariant (window
        # attention + global SCA pooling see the pad), so bucketed metrics
        # differ at the ~1e-2 dB level (tests/test_experiment_runner.py)
        eval_bucket: Optional[int] = None,
        # 'fast' evaluates with the training compute dtype + Pallas kernels;
        # 'exact' evaluates in f32 with matmul precision 'highest' and
        # kernels off — the TPU backend otherwise feeds bf16 inputs to f32
        # matmuls, capping agreement with an f32 oracle at ~35 dB PSNR
        # (utils/precision.py; BASELINE.md metric-parity north star)
        eval_precision: str = "fast",
        # whole-image eval routes through the banded-head runner (BandedHeadSR)
        # at/above this input area (px).  The head banding is value-identical
        # (tests/test_tiling.py::test_banded_head_matches_whole); the knob only
        # trades one extra compiled program against head-activation HBM.  The
        # default sits well under the measured 960x960 whole-vs-tiled
        # crossover and far under the ~18 GB 1080p HBM cliff the banding
        # exists for (ARCHITECTURE.md "Whole-image serving").
        eval_band_area: int = 640 * 640,
        lpips_weights_path: Optional[str] = None,
        progress: bool = True,
        n_devices: Optional[int] = None,
    ):
        assert eval_precision in ("fast", "exact"), eval_precision
        self.eval_precision = eval_precision
        self.eval_band_area = eval_band_area
        self.eval_tile = eval_tile
        self.eval_tile_overlap = eval_tile_overlap
        self.eval_bucket = eval_bucket
        # data parallelism: batch sharded on a 1-D mesh, params/optimizer
        # replicated, XLA emits the gradient all-reduce (the DDP analog —
        # reference toolkits' BasicSR dist_util.py:10-57)
        self.mesh = None
        self._batch_sharding = None
        if n_devices and n_devices > 1:
            from jax.sharding import NamedSharding, PartitionSpec
            from sisr_tpu.parallel.mesh import make_mesh

            assert model_config.batch_size % n_devices == 0, \
                "batch_size must divide n_devices for data parallelism"
            self.mesh = make_mesh(n_devices)
            self._batch_sharding = NamedSharding(self.mesh, PartitionSpec("data"))
        self.train_data_config = train_data_config
        self.eval_data_config = eval_data_config
        self.test_data_config = test_data_config
        self.model_config = model_config
        self.is_test = is_test
        self.eval_mode = eval_mode
        self.progress = progress

        self.lpips = self._init_lpips(lpips_weights_path)

        self.train_loaders: List[DataLoader] = []
        self.eval_loaders: List[DataLoader] = []
        self.test_loaders: List[DataLoader] = []
        self.eval_data_count = 0

        # filled by init_model (subclass)
        self.model = None          # flax module
        self.variables = None      # {'params': ...}
        self.state: Optional[TrainState] = None
        self.tx = None
        self.loss_function: Optional[Callable] = None
        self.lr_schedule = None
        self.start_epoch = 1
        self._rng = jax.random.PRNGKey(0)

        cf = self.model_config.checkpoint_folder
        self.new_model_path = os.path.join(cf, "new_epoch_model.pth")
        self.best_psnr_model_path = os.path.join(cf, "best_psnr_model.pth")
        self.best_ssim_model_path = os.path.join(cf, "best_ssim_model.pth")
        self.best_lpips_model_path = os.path.join(cf, "best_lpips_model.pth")
        self.best_psnr_ssim_lpips_model_path = os.path.join(
            cf, "best_psnr_ssim_lpips_model.pth")

        self.init_data_loaders()
        self.init_model()
        self.init_optimizer_loss_function()
        self.load_model_weights_scheduler()

        self.result_path = os.path.join(
            self.model_config.result_folder,
            os.path.basename(self.model_config.test_model_path).split(".")[0])
        self.result_data_paths = [os.path.join(self.result_path, loader.name)
                                  for loader in self.test_loaders]

        # metric logs (lists of text rows, resumable)
        self.loss_log: List[List[str]] = []
        self.best_epoch_psnr_ssim_lpips_log = [-1, -1, -1, 1]
        self.psnr_ssim_lpips_log: List[List[str]] = []
        self.only_best_psnr = -1.0
        self.only_best_ssim = -1.0
        self.only_best_lpips = 1.0
        self.lr_log = [f"epoch:{self.start_epoch},lr:"
                       f"{format_str(self.current_lr(), 25)}"]
        self.train_eval_seconds_consume_log: List[List[str]] = []
        self.total_seconds_consume_log = [0.0]
        self.load_log()
        self.init_tools()

    # ------------------------------------------------------------------ setup

    def _init_lpips(self, weights_path: Optional[str]):
        """LPIPS(vgg) metric, gated on converted weights being available.

        Pretrained VGG cannot be downloaded here; without weights the metric
        is skipped and logged as its neutral worst-case 1.0 (documented
        divergence from the reference, which hard-requires the lpips package).
        """
        if weights_path and os.path.exists(weights_path):
            from flax import serialization
            from sisr_tpu.models.vgg import LPIPSVgg

            with open(weights_path, "rb") as f:
                variables = serialization.msgpack_restore(f.read())
            model = LPIPSVgg()

            def compute(a_y: np.ndarray, b_y: np.ndarray) -> float:
                # reference quirks (experiment.py:469): LPIPS is fed the
                # (1,h,w) Y image, broadcast across RGB by the scaling layer,
                # AND with lpips.LPIPS's default normalize=False — the [0,1]
                # image is treated as if already in [-1,1]
                a = jnp.asarray(a_y)[None, :, :, None].repeat(3, -1)
                b = jnp.asarray(b_y)[None, :, :, None].repeat(3, -1)
                return float(model.apply({"params": variables["params"]}, a, b,
                                         normalize=False)[0])

            return compute
        return None

    def init_data_loaders(self, is_shuffle: bool = True):
        mc = self.model_config
        for i, path in enumerate(mc.train_data_path_list):
            # per-set seed: augmentation/degradation randomness becomes a pure
            # function of (seed, epoch, index) — reproducible across threads
            dataset = SRDataset(self.train_data_config, path, seed=1009 + i)
            loader = DataLoader(dataset, batch_size=mc.batch_size, shuffle=is_shuffle,
                                drop_last=True, seed=i,
                                name=mc.train_data_name_list[i],
                                num_workers=mc.loader_workers,
                                worker_type=mc.loader_worker_type)
            self.train_loaders.append(loader)
        for i, path in enumerate(mc.eval_data_path_list):
            dataset = SRDataset(self.eval_data_config, path)
            loader = DataLoader(dataset, batch_size=1, name=mc.eval_data_name_list[i])
            self.eval_loaders.append(loader)
            self.eval_data_count += len(loader)
        if self.is_test:
            for i, path in enumerate(mc.test_data_path_list):
                dataset = SRDataset(self.test_data_config, path)
                loader = DataLoader(dataset, batch_size=1, name=mc.test_data_name_list[i])
                self.test_loaders.append(loader)

    def init_model(self):
        assert self.train_data_config.image_size % self.train_data_config.scaling_factor == 0
        self.print_total_params_num()
        # one jitted forward for fixed training shapes + tiled eval runner
        self._train_apply = self.model.apply
        scale = getattr(self.model_config, "scaling_factor", 4)
        eval_model = self.model
        if self.eval_precision == "exact" and hasattr(self.model, "dtype"):
            # params are float32 either way; 'exact' skips the compute-dtype
            # cast (call sites also trace under utils.precision.exact_eval)
            eval_model = self.model.clone(dtype=jnp.float32, parent=None)
        self.tiled = TiledSR(
            lambda variables, x: eval_model.apply(variables, x),
            scale=scale, tile=self.eval_tile, overlap=self.eval_tile_overlap)
        self._whole_eval = jax.jit(lambda v, x: jnp.clip(eval_model.apply(v, x), 0, 1))
        # large whole-image eval streams the x4 head over feature-row bands
        # (parallel/tiling.py::BandedHeadSR): the unbanded 4x-res head
        # activations cost ~4 KB/feature px of HBM (1080p frame ≈ 18 GB)
        self._banded_eval = None
        if getattr(eval_model, "upsampler", None) == "nearest+conv":
            from sisr_tpu.parallel.tiling import BandedHeadSR
            self._banded_eval = BandedHeadSR(eval_model)
        self._band_area = self.eval_band_area

    def print_total_params_num(self):
        total = sum(int(np.prod(p.shape))
                    for p in jax.tree.leaves(self.variables["params"]))
        descr = f"Total parameters: {total}"
        print(descr)
        if jax.process_index() != 0:  # rank-0 I/O (BasicSR master_only analog)
            return
        with open(os.path.join(self.model_config.log_folder, "模型参数量.txt"), "w") as f:
            f.write(descr + "\n")

    def init_optimizer_loss_function(self):
        mc = self.model_config
        self.tx = get_optimizer(mc.optimizer, mc.learning_rate, mc.optimizer_params)
        self.loss_function = get_loss_function(mc.loss_function)
        self.lr_schedule = get_scheduler(mc.learning_rate, mc.min_learning_rate, mc.epochs)
        self.state = self._place_state(
            create_train_state(self.variables["params"], self.tx))
        self.train_step = make_train_step(self._train_apply, self.loss_function, self.tx)

    def _place_state(self, state):
        """Replicate train state over the mesh (no-op single-device)."""
        if self.mesh is None:
            return state
        from sisr_tpu.parallel.mesh import replicate
        return replicate(self.mesh, state)

    def _place_batch(self, lr_imgs, hr_imgs):
        if self._batch_sharding is None:
            return jnp.asarray(lr_imgs), jnp.asarray(hr_imgs)
        put = lambda x: jax.device_put(x, self._batch_sharding)
        return put(lr_imgs), put(hr_imgs)

    def load_model_weights_scheduler(self, is_gan_start: bool = False):
        path = self.model_config.test_model_path if self.is_test else self.new_model_path
        if os.path.exists(path):
            loaded = ckpt.load_any(path, self.variables["params"], self.state.opt_state)
            params = loaded["model"]
            opt_state = self.state.opt_state
            if loaded["optimizer"] is not None and not is_gan_start:
                opt_state = loaded["optimizer"]
            self.state = self._place_state(TrainState(params, opt_state))
            self.variables = {"params": params}
            if not self.gan_mode:
                self.start_epoch = loaded["start_epoch"] + 1
            print(f"loaded weights from {path}, trained epochs: {self.start_epoch - 1}")
        self._sync_epoch_lr()

    def current_lr(self) -> float:
        return self.lr_schedule(self.start_epoch - 1)

    def _sync_epoch_lr(self):
        """Drive the per-epoch cosine schedule into the injected optimizer lr
        (replaces torch's scheduler reconstruction, experiment.py:247-252)."""
        if self.state is not None:
            self.state = TrainState(
                self.state.params,
                set_learning_rate(self.state.opt_state, self.current_lr()))

    def save_model_weights(self, model_path: str, params=None, opt_state=None):
        if jax.process_index() != 0:  # rank-0 I/O (BasicSR master_only analog)
            return
        ckpt.save_checkpoint(
            model_path, self.start_epoch,
            self.state.params if params is None else params,
            self.state.opt_state if opt_state is None else opt_state)

    def init_tools(self):
        self.epoch_loss = AverageMeter()
        self.train_start_time = None
        self.epoch_psnr = AverageMeter()
        self.epoch_ssim = AverageMeter()
        self.epoch_lpips = AverageMeter()
        self.eval_start_time = None
        self.test_set_psnr = AverageMeter()
        self.test_set_ssim = AverageMeter()
        self.test_set_lpips = AverageMeter()
        self.test_start_time = None

    # ------------------------------------------------------------------- logs

    def _log_paths(self):
        lf = self.model_config.log_folder
        return {
            "loss": os.path.join(lf, "loss_log.txt"),
            "psnr_ssim_lpips": os.path.join(lf, "psnr_ssim_lpips_log.txt"),
            "best": os.path.join(lf, "best_epoch_psnr_ssim_lpips_log.txt"),
            "lr": os.path.join(lf, "lr_log.txt"),
            "seconds": os.path.join(lf, "train_eval_seconds_consume_log.txt"),
            "total_seconds": os.path.join(lf, "total_seconds_consume_log.txt"),
        }

    @staticmethod
    def _write_rows(path: str, rows):
        if jax.process_index() != 0:  # rank-0 I/O (BasicSR master_only analog)
            return
        with open(path, "w") as f:
            for row in rows:
                f.write(" ".join(str(c) for c in row) if isinstance(row, (list, tuple))
                        else str(row))
                f.write("\n")

    @staticmethod
    def _read_rows(path: str) -> List[List[str]]:
        with open(path) as f:
            return [line.split() for line in f.read().splitlines() if line.strip()]

    def load_log(self):
        if self.is_test:
            return
        p = self._log_paths()
        self.loss_log_path = p["loss"]
        self.psnr_ssim_lpips_log_path = p["psnr_ssim_lpips"]
        self.best_epoch_psnr_ssim_lpips_log_path = p["best"]
        self.lr_log_path = p["lr"]
        self.train_eval_seconds_consume_log_path = p["seconds"]
        self.total_seconds_consume_log_path = p["total_seconds"]

        if os.path.exists(p["loss"]):
            self.loss_log = self._read_rows(p["loss"])
        if os.path.exists(p["psnr_ssim_lpips"]):
            self.psnr_ssim_lpips_log = self._read_rows(p["psnr_ssim_lpips"])
            arr = np.array(self.psnr_ssim_lpips_log)
            self.only_best_psnr = arr[:, 1].astype(float).max()
            self.only_best_ssim = arr[:, 2].astype(float).max()
            self.only_best_lpips = arr[:, 3].astype(float).min()
        if os.path.exists(p["best"]):
            rows = self._read_rows(p["best"])
            flat = [c for row in rows for c in row]
            self.best_epoch_psnr_ssim_lpips_log = [float(x) for x in flat[:4]]
        if os.path.exists(p["lr"]):
            self.lr_log = [" ".join(r) for r in self._read_rows(p["lr"])]
        if not self.gan_mode and self.lr_log:
            self.lr_log[-1] = (f"epoch:{self.start_epoch},"
                               f"lr:{format_str(self.current_lr(), 25)}")
        if os.path.exists(p["seconds"]):
            self.train_eval_seconds_consume_log = self._read_rows(p["seconds"])
            for item in self.train_eval_seconds_consume_log:
                self.total_seconds_consume_log[0] += float(item[1].split("训练时长:")[1])
                if item[2] != "None":
                    self.total_seconds_consume_log[0] += float(item[2].split("验证时长:")[1])

    def __save_log(self):
        self._write_rows(self.train_eval_seconds_consume_log_path,
                         self.train_eval_seconds_consume_log)
        self._write_rows(self.psnr_ssim_lpips_log_path, self.psnr_ssim_lpips_log)
        self._write_rows(self.best_epoch_psnr_ssim_lpips_log_path,
                         [self.best_epoch_psnr_ssim_lpips_log])
        self._write_rows(self.total_seconds_consume_log_path,
                         [self.total_seconds_consume_log[0]])

    # ------------------------------------------------------------------ train

    def preprocess_train(self):
        ...

    def process_lr_imgs(self, stage, lr_imgs):
        return lr_imgs

    def process_hr_imgs(self, stage, hr_imgs):
        return hr_imgs

    def process_sr_imgs(self, stage, sr_imgs):
        return sr_imgs

    def train_batch(self, lr_imgs: np.ndarray, hr_imgs: np.ndarray):
        self._rng, step_rng = jax.random.split(self._rng)
        lr_imgs, hr_imgs = self._place_batch(lr_imgs, hr_imgs)
        self.state, loss = self.train_step(self.state, lr_imgs, hr_imgs, step_rng)
        self.epoch_loss.update(float(loss), len(hr_imgs))

    def train(self):
        self.epoch_loss.reset()
        self.train_start_time = time.time()
        from sisr_tpu.data.prefetch import device_prefetch

        for li, loader in enumerate(self.train_loaders):
            it = device_prefetch(loader, size=2, sharding=self._batch_sharding)
            if self.progress:
                from tqdm import tqdm
                it = tqdm(it, total=len(loader),
                          desc=f"train_epoch {self.start_epoch}/"
                               f"{self.model_config.epochs}, data: {loader.name}")
            for lr_imgs, hr_imgs, _ in it:
                lr_imgs = self.process_lr_imgs("train", lr_imgs)
                hr_imgs = self.process_hr_imgs("train", hr_imgs)
                self.train_batch(lr_imgs, hr_imgs)
            if self.progress:
                it.set_postfix({"loss": f"{self.epoch_loss.avg:.6f}"})
        self.train_dataloader_process()

    def train_dataloader_process(self):
        self.loss_log.append([f"epoch:{self.start_epoch:05d}",
                              f"loss:{self.epoch_loss.avg}"])
        train_time = time.time() - self.train_start_time
        self.train_eval_seconds_consume_log.append(
            [f"epoch:{self.start_epoch:05d}",
             format_str(f"训练时长:{train_time}", 25), "None", "None"])
        self.total_seconds_consume_log[0] += train_time
        self.save_model_weights(self.new_model_path)
        # next-epoch lr (cosine stepped per epoch)
        next_lr = self.lr_schedule(self.start_epoch)
        self.lr_log.append(f"epoch:{self.start_epoch + 1},lr:{format_str(next_lr, 25)}")
        if not self.gan_mode:
            self._write_rows(self.loss_log_path, self.loss_log)
            self._write_rows(self.lr_log_path, [[row] for row in self.lr_log])
        self._write_rows(self.train_eval_seconds_consume_log_path,
                         self.train_eval_seconds_consume_log)

    # ------------------------------------------------------------------- eval

    def _place_eval(self, x: jnp.ndarray) -> jnp.ndarray:
        """Replicate an eval input over the mesh when it spans processes.

        Under multi-controller JAX an uncommitted local array cannot feed a
        jit whose other operands (the replicated params) live on a
        cross-process mesh — the placement must be explicit.  Single-process
        (or no mesh) keeps the uncommitted array: jit reshards it freely.
        """
        if self.mesh is not None and jax.process_count() > 1:
            from jax.sharding import NamedSharding, PartitionSpec
            return jax.device_put(x, NamedSharding(self.mesh, PartitionSpec()))
        return x

    def _infer_one(self, lr_img: np.ndarray) -> np.ndarray:
        """(1,h,w,3) -> clipped (1,H,W,3) SR via tiled or whole-image path."""
        if self.eval_precision == "exact":
            from sisr_tpu.utils.precision import exact_eval
            with exact_eval():
                return self._infer_one_traced(lr_img)
        return self._infer_one_traced(lr_img)

    def _infer_one_traced(self, lr_img: np.ndarray) -> np.ndarray:
        variables = {"params": self.state.params}
        if self.eval_mode == "tiled":
            sr = self.tiled(variables, jnp.asarray(lr_img[0]))
            return np.clip(np.asarray(sr), 0, 1)[None]
        if self.eval_bucket:
            bkt = self.eval_bucket
            h, w = lr_img.shape[1:3]
            ph, pw = (-h) % bkt, (-w) % bkt
            if ph or pw:
                mode = "reflect" if (ph < h and pw < w) else "symmetric"
                padded = np.pad(lr_img, ((0, 0), (0, ph), (0, pw), (0, 0)),
                                mode=mode)
                sr = self._whole_forward(variables, padded)
                s = getattr(self.model_config, "scaling_factor", 4)
                return sr[:, :h * s, :w * s]
        return self._whole_forward(variables, lr_img)

    def _whole_forward(self, variables, lr_img) -> np.ndarray:
        if (self._banded_eval is not None
                and lr_img.shape[1] * lr_img.shape[2] >= self._band_area):
            x = self._place_eval(jnp.asarray(lr_img))
            return np.clip(np.asarray(self._banded_eval(variables, x[0])), 0, 1)[None]
        return np.asarray(self._whole_eval(
            variables, self._place_eval(jnp.asarray(lr_img))))

    def _metrics_of(self, hr: np.ndarray, sr: np.ndarray, gaussian: bool):
        hr_y = convert_image(hr[0], source="[0,1]", target="y-channel")
        sr_y = convert_image(sr[0], source="[0,1]", target="y-channel")
        p = psnr_fn(hr_y, sr_y, 1.0)
        s = ssim_fn(hr_y, sr_y, 1.0, gaussian_weights=gaussian)
        l = self.lpips(hr_y, sr_y) if self.lpips else None
        return p, s, l

    def eval_batch(self, hr_img, sr_img):
        p, s, l = self._metrics_of(hr_img, sr_img, gaussian=False)
        if np.isnan(p) or np.isnan(s) or (l is not None and np.isnan(l)):
            raise ValueError("experiment metric is NaN")
        self.epoch_psnr.update(p, 1)
        self.epoch_ssim.update(s, 1)
        if l is not None:
            self.epoch_lpips.update(l, 1)

    def eval(self, start_epoch: Optional[int] = None):
        self.epoch_psnr.reset()
        self.epoch_ssim.reset()
        self.epoch_lpips.reset()
        self.eval_start_time = time.time()
        for i, loader in enumerate(self.eval_loaders):
            it = loader
            if self.progress:
                from tqdm import tqdm
                it = tqdm(loader, total=len(loader),
                          desc=f"eval_epoch {start_epoch or self.start_epoch}/"
                               f"{self.model_config.epochs}, data: {loader.name}")
            for lr_imgs, hr_imgs, _ in it:
                lr_imgs = self.process_lr_imgs("eval", lr_imgs)
                hr_imgs = self.process_hr_imgs("eval", hr_imgs)
                sr_imgs = self.process_sr_imgs("eval", self._infer_one(lr_imgs))
                self.eval_batch(hr_imgs, sr_imgs)
            if i == len(self.eval_loaders) - 1:
                self.__eval_dataloader_process(loader.name, start_epoch)

    def __eval_dataloader_process(self, dataloader_name: str,
                                  start_epoch: Optional[int] = None):
        start_epoch = start_epoch if start_epoch is not None else self.start_epoch
        if self.epoch_lpips.avg == 0:
            # all-lpips-failed sentinel (reference :505-506); must stay a
            # decimal string — format_str zero-pads, and "1" would become 1e17
            self.epoch_lpips.avg = 1.0

        self.psnr_ssim_lpips_log.append([
            f"epoch:{start_epoch:05d}",
            format_str(f"{self.epoch_psnr.avg}"),
            format_str(f"{self.epoch_ssim.avg}"),
            format_str(f"{self.epoch_lpips.avg}"),
        ])
        if self.epoch_psnr.avg > self.only_best_psnr:
            self.only_best_psnr = self.epoch_psnr.avg
            self.save_model_weights(self.best_psnr_model_path)
        if self.epoch_ssim.avg > self.only_best_ssim:
            self.only_best_ssim = self.epoch_ssim.avg
            self.save_model_weights(self.best_ssim_model_path)
        if self.epoch_lpips.avg < self.only_best_lpips:
            self.only_best_lpips = self.epoch_lpips.avg
            self.save_model_weights(self.best_lpips_model_path)
        # without LPIPS weights the metric is pinned at 1.0 — don't let it veto
        # the combined-best rule (reference semantics assume lpips present)
        lpips_improved = (self.epoch_lpips.avg < float(self.best_epoch_psnr_ssim_lpips_log[3])
                          if self.lpips else
                          self.epoch_lpips.avg <= float(self.best_epoch_psnr_ssim_lpips_log[3]))
        if (self.epoch_psnr.avg > float(self.best_epoch_psnr_ssim_lpips_log[1])
                and self.epoch_ssim.avg > float(self.best_epoch_psnr_ssim_lpips_log[2])
                and lpips_improved):
            self.best_epoch_psnr_ssim_lpips_log = [
                f"{start_epoch:05d}", self.epoch_psnr.avg,
                self.epoch_ssim.avg, self.epoch_lpips.avg]
            self.save_model_weights(self.best_psnr_ssim_lpips_model_path)

        eval_time = time.time() - self.eval_start_time
        self.train_eval_seconds_consume_log[-1][2] = format_str(f"验证时长:{eval_time}", 25)
        if str(self.train_eval_seconds_consume_log[-1][3]) == "None":
            self.train_eval_seconds_consume_log[-1][3] = f"验证数据集:{dataloader_name}"
        else:
            self.train_eval_seconds_consume_log[-1][3] += f"、{dataloader_name}"
        self.total_seconds_consume_log[0] += eval_time
        self.__save_log()

    # ------------------------------------------------------------------- test

    def test_batch(self, hr_img, sr_img, filename, suffix, dataloader_name):
        p, s, l = self._metrics_of(hr_img, sr_img, gaussian=True)
        self.test_set_psnr.update(p, 1)
        self.test_set_ssim.update(s, 1)
        if l is not None:
            self.test_set_lpips.update(l, 1)

        result_path = os.path.join(self.result_path, dataloader_name)
        os.makedirs(result_path, exist_ok=True)
        from PIL import Image

        for tag, img in (("hr", hr_img), ("sr", sr_img)):
            arr = (np.clip(img[0], 0, 1) * 255.0).round().astype(np.uint8)
            Image.fromarray(arr).save(
                os.path.join(result_path, f"{filename}_{tag}.{suffix}"))

    def __save_test_log(self, subfolder: str):
        rows = [[f"psnr:{self.test_set_psnr.avg}", f"ssim:{self.test_set_ssim.avg}",
                 f"lpips:{self.test_set_lpips.avg if self.test_set_lpips.count else 'n/a'}"],
                ["test_time:", time.time() - self.test_start_time, " "]]
        self._write_rows(os.path.join(self.result_path, subfolder, "test_log.txt"), rows)

    def _test(self):
        os.makedirs(self.result_path, exist_ok=True)
        for path in self.result_data_paths:
            os.makedirs(path, exist_ok=True)
        for loader in self.test_loaders:
            self.test_set_psnr.reset()
            self.test_set_ssim.reset()
            self.test_set_lpips.reset()
            self.test_start_time = time.time()
            it = loader
            if self.progress:
                from tqdm import tqdm
                it = tqdm(loader, total=len(loader),
                          desc=f"start test, current test data: {loader.name}")
            for lr_imgs, hr_imgs, (filenames, suffixes) in it:
                lr_imgs = self.process_lr_imgs("test", lr_imgs)
                hr_imgs = self.process_hr_imgs("test", hr_imgs)
                sr_imgs = self.process_sr_imgs("test", self._infer_one(lr_imgs))
                self.test_batch(hr_imgs, sr_imgs, filenames[0], suffixes[0], loader.name)
            self.__save_test_log(loader.name)

    # -------------------------------------------------------------------- run

    def run(self):
        print(f"{type(self).__name__}.run...")
        if not self.is_test:
            # repair an interrupted eval: loss log one epoch ahead of metrics
            if self.start_epoch - 2 == len(self.psnr_ssim_lpips_log) \
                    and self.start_epoch >= 2:
                self.eval_start_time = time.time()
                self.eval(start_epoch=self.start_epoch - 1)
                self.save_epoch_mode_5(self.start_epoch - 1)

            for epoch in range(self.start_epoch, self.model_config.epochs + 1):
                self.start_epoch = epoch
                self._sync_epoch_lr()
                self.preprocess_train()
                self.train()
                self.eval()
                self.save_epoch_mode_5(epoch)
            print("training complete")
        else:
            self._test()

    def save_epoch_mode_5(self, epoch: int):
        """Rolling epoch=N snapshot of weights/ and logs/ every 5 epochs
        (reference experiment.py:857-878)."""
        if epoch % 5 != 0:
            return
        for folder, pattern in ((self.model_config.checkpoint_folder, "/*.pth"),
                                (self.model_config.log_folder, "/*.txt")):
            files = glob.glob(folder + pattern)
            old = os.path.join(folder, f"epoch={5 if epoch == 5 else epoch - 5}")
            os.makedirs(old, exist_ok=True)
            new = old if epoch == 5 else os.path.join(folder, f"epoch={epoch}")
            if new != old:
                os.rename(old, new)
            for f in files:
                shutil.copy(f, os.path.join(new, os.path.basename(f)))
