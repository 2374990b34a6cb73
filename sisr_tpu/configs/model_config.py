"""Experiment/model configuration + optimizer/loss/schedule factories.

Field-for-field parity with reference configs/model_config.py, re-based on
optax:

* ``get_optimizer``     — Adam (betas/weight_decay kwargs as in torch)
* ``get_loss_function`` — mse / l1 / charbonnier
* ``get_scheduler``     — cosine annealing stepped once per epoch, with the
  closed form of torch CosineAnnealingLR so resume-from-epoch matches
  (reference experiments/experiment.py:247-252 rebuilds the scheduler with
  last_epoch = start_epoch - 2).
"""

from __future__ import annotations

import math
import os
from typing import Callable, Dict, List, Optional

import optax

optimizers = ["Adam"]
loss_functions = ["mse", "l1", "charbonnier"]


def get_scheduler(base_lr: float, min_lr: float, epochs: int) -> Callable[[int], float]:
    """Returns epoch_index (0-based) -> lr, torch CosineAnnealingLR closed form.

    Epoch e (1-based) trains with lr(e-1); schedule period T_max = epochs.
    """

    def lr(epoch_idx: int) -> float:
        return min_lr + (base_lr - min_lr) * (1 + math.cos(math.pi * epoch_idx / epochs)) / 2

    return lr


def get_optimizer(
    optimizer_name: str,
    lr: float,
    kwarg: Optional[Dict] = None,
) -> optax.GradientTransformation:
    """Adam with torch-parameterisation; lr is injected per-epoch via
    ``optax.inject_hyperparams`` so the cosine schedule can be driven from the
    experiment loop (and checkpoint-resumed) exactly like the reference."""
    assert optimizer_name in optimizers, f"optimizer must be in {optimizers}"
    kwarg = dict(kwarg or {})
    betas = kwarg.pop("betas", (0.9, 0.999))
    weight_decay = kwarg.pop("weight_decay", 0.0)
    eps = kwarg.pop("eps", 1e-8)

    def make(learning_rate):
        if weight_decay:
            return optax.adamw(learning_rate, b1=betas[0], b2=betas[1], eps=eps,
                               weight_decay=weight_decay)
        return optax.adam(learning_rate, b1=betas[0], b2=betas[1], eps=eps)

    return optax.inject_hyperparams(make)(learning_rate=lr)


def get_loss_function(loss_function_name: str) -> Callable:
    """Pixel loss on (pred, target) arrays, mean-reduced."""
    from sisr_tpu.train.losses import l1_loss, mse_loss, charbonnier_loss

    assert loss_function_name in loss_functions, \
        f"loss_function must be in {loss_functions}"
    return {"mse": mse_loss, "l1": l1_loss, "charbonnier": charbonnier_loss}[loss_function_name]


class ModelConfig:
    def __init__(
        self,
        batch_size: int,
        learning_rate: float,
        min_learning_rate: float,
        optimizer: str,
        optimizer_params: dict,
        loss_function: str,
        epochs: int,
        checkpoint_folder: str,
        test_model_path: str,
        result_folder: str,
        log_folder: str,
        train_data_folder: str,
        train_data_name_list: List[str],
        eval_data_folder: str,
        eval_data_name_list: List[str],
        test_data_folder: str,
        test_data_name_list: List[str],
        compute_dtype: str = "float32",
        # host loader: the train split defaults to the spawn-based process
        # pool so the BSRGAN degradation scales with host cores (the
        # reference trains input-bound with num_workers=0 —
        # experiments/experiment.py:141-147; SURVEY.md §7 step 5)
        loader_workers: int = 2,
        loader_worker_type: str = "process",
    ):
        self.batch_size = batch_size
        self.learning_rate = learning_rate
        self.min_learning_rate = min_learning_rate
        self.optimizer = optimizer
        self.optimizer_params = optimizer_params
        self.loss_function = loss_function
        self.epochs = epochs
        self.checkpoint_folder = checkpoint_folder
        self.test_model_path = test_model_path
        self.result_folder = result_folder
        self.log_folder = log_folder
        self.train_data_folder = train_data_folder
        self.train_data_name_list = train_data_name_list
        self.eval_data_folder = eval_data_folder
        self.eval_data_name_list = eval_data_name_list
        self.test_data_folder = test_data_folder
        self.test_data_name_list = test_data_name_list
        self.compute_dtype = compute_dtype
        self.loader_workers = loader_workers
        self.loader_worker_type = loader_worker_type

        assert self.loader_worker_type in ("thread", "process"), \
            "loader_worker_type must be 'thread' or 'process'"
        assert self.optimizer in optimizers, f"optimizer must be in {optimizers}"
        assert self.loss_function in loss_functions, \
            f"loss_function must be in {loss_functions}"

        for folder in (self.checkpoint_folder, self.result_folder, self.log_folder):
            if folder is not None and not os.path.exists(folder):
                os.makedirs(folder, exist_ok=True)

        for lst, label in ((train_data_name_list, "train"),
                           (eval_data_name_list, "eval"),
                           (test_data_name_list, "test")):
            assert lst is not None and len(lst) > 0, \
                f"{label}_data_name_list must be a non-empty list"

        self.train_data_path_list = [os.path.join(train_data_folder, n)
                                     for n in train_data_name_list]
        self.eval_data_path_list = [os.path.join(eval_data_folder, n)
                                    for n in eval_data_name_list]
        self.test_data_path_list = [os.path.join(test_data_folder, n)
                                    for n in test_data_name_list]
