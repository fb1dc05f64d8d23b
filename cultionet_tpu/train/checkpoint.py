"""Checkpointing: orbax-backed train-state persistence with a best-k policy.

Capability parity with the reference's Lightning ModelCheckpoint setup
(callbacks.py:238-249; model.py:264-314): a ``last`` checkpoint every epoch,
a ``best`` checkpoint minimizing the composite ``val_score``, embedded
hyperparameters so ``load_model`` can reconstruct the model without the
original config (lightning.py:720,853), and auto-resume from ``last``.

Layout: ``<ckpt_dir>/<which>/model`` (params + batch_stats + step) and
``<ckpt_dir>/<which>/opt`` (optimizer state) are separate orbax checkpoints,
so inference-time restores never depend on the optimizer structure. The
normalization sidecar (``last.norm``) is handled by NormValues.
"""

import json
import shutil
import typing as T
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp

from .step import TrainState


class Checkpointer:
    """Manages ``<ckpt_dir>/{last,best}`` train-state checkpoints."""

    def __init__(self, ckpt_dir: T.Union[str, Path]):
        self.ckpt_dir = Path(ckpt_dir).absolute()
        self.ckpt_dir.mkdir(parents=True, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    # ------------------------------------------------------------------

    @property
    def last_path(self) -> Path:
        return self.ckpt_dir / "last"

    @property
    def best_path(self) -> Path:
        return self.ckpt_dir / "best"

    def _meta_path(self, which: str) -> Path:
        return self.ckpt_dir / f"{which}.meta.json"

    def has_last(self) -> bool:
        return (self.last_path / "model").exists() and self._meta_path(
            "last"
        ).exists()

    def has_best(self) -> bool:
        return (self.best_path / "model").exists() and self._meta_path(
            "best"
        ).exists()

    # ------------------------------------------------------------------

    @staticmethod
    def _model_payload(state: TrainState) -> dict:
        return {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "step": state.step,
        }

    def _wait(self) -> None:
        if hasattr(self._ckptr, "wait_until_finished"):
            self._ckptr.wait_until_finished()

    def _save(
        self,
        which: str,
        state: TrainState,
        epoch: int,
        metrics: T.Optional[T.Dict[str, float]] = None,
        hyperparams: T.Optional[dict] = None,
    ) -> None:
        path = self.ckpt_dir / which
        self._wait()
        if path.exists():
            shutil.rmtree(path)
        self._ckptr.save(path / "model", self._model_payload(state))
        self._ckptr.save(path / "opt", {"opt_state": state.opt_state})
        self._wait()
        meta = {
            "epoch": int(epoch),
            "step": int(state.step),
            "metrics": {k: float(v) for k, v in (metrics or {}).items()},
            "hyperparams": hyperparams or {},
        }
        self._meta_path(which).write_text(json.dumps(meta, indent=2))

    def save_last(self, state, epoch, metrics=None, hyperparams=None):
        self._save("last", state, epoch, metrics, hyperparams)

    def save_best(self, state, epoch, metrics=None, hyperparams=None):
        self._save("best", state, epoch, metrics, hyperparams)

    # ------------------------------------------------------------------

    def load_meta(self, which: str = "last") -> dict:
        return json.loads(self._meta_path(which).read_text())

    def restore(
        self,
        template: TrainState,
        which: str = "last",
        with_opt_state: bool = True,
    ) -> TrainState:
        """Restore into the structure of ``template``. With
        ``with_opt_state=False`` (inference), the optimizer state is left as
        the template's — no structural match with the training-time optimizer
        is required."""
        as_np = lambda tree: jax.tree_util.tree_map(np.asarray, tree)
        payload = self._ckptr.restore(
            self.ckpt_dir / which / "model",
            target=as_np(self._model_payload(template)),
        )
        state = template.replace(
            params=payload["params"],
            batch_stats=payload["batch_stats"],
            step=payload["step"],
        )
        if with_opt_state:
            opt = self._ckptr.restore(
                self.ckpt_dir / which / "opt",
                target=as_np({"opt_state": template.opt_state}),
            )
            state = state.replace(opt_state=opt["opt_state"])
        return state
