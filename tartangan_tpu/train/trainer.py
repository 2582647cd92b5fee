"""Trainer core: host-side orchestration around a single jitted train step.

Parity: reference tartangan/trainers/trainer.py (epoch/step loop, two-pass
CLI assembly, run-id, logs dict, component dispatch, dataset selection).

TPU-first structure the reference lacks (SURVEY.md section 7): everything
device-heavy — D step, R1, G step, EMA, losses — is one compiled
``train_step(state, batch_u8, rng)``; the host loop only shuffles indices,
random-crops uint8, prefetches batches to HBM, and fans out component hooks.
Batches arrive as uint8 and are normalized on device. Scale-out is a 1-D
data mesh: params replicated, batch sharded, XLA inserting the gradient
all-reduces (the reference is strictly single-device, SURVEY.md section 2.11).
"""
from __future__ import annotations

import argparse
import os
import random
import string
import time
from collections import defaultdict
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

from ..data.image_bytes import ImageBytesDataset
from ..data.image_folder import ImageFolderDataset
from ..data.prefetch import EpochBatcher, prefetch_to_device
from ..parallel.mesh import (
    data_sharding,
    make_mesh,
    param_sharding,
    replicated_sharding,
)
from ..utils.cli import save_cli_arguments, type_or_none
from ..utils.fs import maybe_makedirs


def resolve_dtype(name: str):
    """``--dtype`` flag -> compute dtype. 'auto' = bf16 on TPU, f32 elsewhere."""
    if name == "auto":
        return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    return {"bf16": jnp.bfloat16, "f32": jnp.float32}[name]


class Trainer:
    """Base trainer. Subclasses implement ``build_models`` (constructing the
    flax modules, the optimizers, the initial state pytree, and the jitted
    ``self._train_step``)."""

    def __init__(self, args, components):
        self.args = args

        # fail fast on a bad dataset path (before minutes of XLA compile);
        # s3:// paths are validated lazily at load
        from ..utils.fs import is_s3_path
        if (getattr(args, "data_path", None)
                and not is_s3_path(args.data_path)
                and not os.path.exists(args.data_path)):
            raise FileNotFoundError(
                f"data_path does not exist: {args.data_path}")

        if args.run_id is None:
            self.run_id = self._generate_run_id()
        else:
            self.run_id = args.run_id

        maybe_makedirs(self.output_root, exist_ok=True)
        self._save_cli_arguments()

        from .components.container import ComponentContainer
        self.components = ComponentContainer()
        self.components.trainer = self
        self.components.add_components(*components)

        self.steps = 0
        self.epoch = 1
        self.steps_per_call = max(getattr(args, "steps_per_call", 1) or 1, 1)

        # device topology: 1-D data mesh, or 2-D (data, model) with --tp
        self.mesh = make_mesh(args.num_devices, tp=getattr(args, 'tp', 1))
        self.dtype = resolve_dtype(args.dtype)
        self._batch_sharding = data_sharding(self.mesh)
        self._replicated = replicated_sharding(self.mesh)

        # rngs: jax key for device-side sampling, numpy for host-side
        # shuffles. The key chain lives on the CPU backend: splits are pure
        # host work (no accelerator dispatch per step), and — critically on
        # relayed-TPU setups — splitting never mixes backends. A TPU-resident
        # key split under the CPU-pinned init context is a cross-backend
        # device->host fetch, and the FIRST such fetch permanently drops this
        # environment's relay out of pipelined dispatch (docs/PERF.md
        # "readback poison"). Keys are tiny; jit uploads them per call.
        try:
            self._key_device = jax.devices("cpu")[0]
            with jax.default_device(self._key_device):
                self.root_key = jax.random.PRNGKey(args.seed)
        except RuntimeError:  # no CPU backend registered
            self._key_device = None
            self.root_key = jax.random.PRNGKey(args.seed)
        self._key = self.root_key
        self.np_rng = np.random.default_rng(args.seed)

    # ------------------------------------------------------------- rng utils
    def next_key(self):
        if self._key_device is not None:
            # keep the split on the CPU backend even when a caller invokes
            # next_key from inside another default_device context
            with jax.default_device(self._key_device):
                self._key, sub = jax.random.split(self._key)
        else:
            self._key, sub = jax.random.split(self._key)
        return sub

    # ----------------------------------------------------------------- hooks
    def build_models(self):
        raise NotImplementedError

    def prepare_dataset(self):
        """Directory -> lazy-resize folder dataset; file -> pre-resized
        archive with train-time RandomCrop (reference trainer.py:53-78)."""
        img_size = self.g.max_size
        if os.path.isdir(self.args.data_path):
            dataset = ImageFolderDataset(self.args.data_path, img_size)
            if self.args.dataset_cache:
                dataset.load_cache(
                    self.dataset_cache_path(img_size, root=dataset.root))
        else:
            dataset = ImageBytesDataset.from_path(
                self.args.data_path, crop_size=img_size
            )
        return dataset

    def dataset_cache_path(self, size, root=None):
        import hashlib
        root = root if root is not None else self.dataset.root
        root_hash = hashlib.md5(root.encode("utf-8")).hexdigest()
        return self.args.dataset_cache.format(root=root_hash, size=size)

    # ---------------------------------------------------- device-resident data
    def _setup_device_data(self):
        """--device-data: park the uint8 archive in HBM once and fuse the
        random gather+crop into the jitted step — zero per-step host->device
        transfers (data/device.py has the full rationale)."""
        from ..data.device import (
            archive_sharding,
            make_device_sampler,
            wrap_step_with_device_data,
        )
        images = getattr(self.dataset, "images", None)
        if images is None:
            raise NotImplementedError(
                "--device-data requires a pre-resized uint8 archive "
                "(ImageBytesDataset); folder/text datasets stream from host")
        sampler = make_device_sampler(
            images.shape, self.dataset.crop_size, self.args.batch_size)
        self._archive = jax.device_put(images, archive_sharding(self.mesh))
        base = self.make_train_step()
        wrap = lambda fn: wrap_step_with_device_data(
            fn, sampler, self._batch_sharding)
        step = wrap(base)
        alt = getattr(base, "no_r1", None)
        if self.steps_per_call > 1:
            from .multi import chunk_train_step
            step = chunk_train_step(
                step, self.steps_per_call, "broadcast",
                alt_step_fn=wrap(alt) if alt is not None else None,
                alt_interval=getattr(base, "r1_interval", 1))
        elif alt is not None:
            # k == 1: alternate host-side on the global step counter
            self._device_step_alt = jax.jit(wrap(alt), donate_argnums=(0,))
        self._device_step = jax.jit(step, donate_argnums=(0,))

    # ------------------------------------------------------------ train loop
    def train(self):
        self.build_models()
        print(f"Preparing dataset from {self.args.data_path}")
        self.dataset = self.prepare_dataset()
        if self.args.device_data:
            self._setup_device_data()
        elif (getattr(self.dataset, "images", None) is not None
                and not self.args.quiet_logs):
            mb = self.dataset.images.nbytes / 1e6
            print(f"hint: the archive is {mb:.0f} MB of uint8 — "
                  "--device-data would park it in HBM and remove the "
                  "per-step host->device transfer")
        batcher = EpochBatcher(
            self.dataset, self.args.batch_size, seed=self.args.seed
        )
        logs = defaultdict(list)
        self.logs = logs

        # preemption safety (beyond the reference's KeyboardInterrupt-only
        # handling, trainer.py:113-114): SIGTERM triggers the same graceful
        # shutdown -> final checkpoint + samples + metric flush
        import signal

        def _on_sigterm(signum, frame):
            raise KeyboardInterrupt

        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:  # not on the main thread
            prev_handler = None
        from .progress import ProgressLine
        progress = ProgressLine(newlines=self.args.log_progress_newlines)
        k = self.steps_per_call
        self._warn_chunk_cadence(k)
        # with chunking, an epoch runs the largest multiple of K batches
        # that fits (a shorter trailing chunk would be a new shape ->
        # recompile; documented in train/multi.py::stack_batches)
        num_batches = (len(self.dataset) // self.args.batch_size // k) * k
        if num_batches == 0:
            avail = len(self.dataset) // self.args.batch_size
            raise ValueError(
                f"dataset yields only {avail} batch(es) of size "
                f"{self.args.batch_size} but --steps-per-call={k} needs at "
                f"least {k} per epoch; lower --steps-per-call or "
                "--batch-size (training would otherwise run zero steps)")
        try:
            self.components.invoke("train_begin", self.steps, logs)
            while self.epoch <= self.args.epochs:
                if not self.args.quiet_logs:
                    print(f"Starting epoch {self.epoch}")
                self.components.invoke(
                    "epoch_begin", self.steps, self.epoch, logs)
                progress.epoch_begin(self.epoch, num_batches)
                epoch_batches = 0
                if self.args.device_data:
                    # same epoch cadence, but batches materialize on-chip
                    batch_iter = iter([None] * (num_batches // k))
                elif k > 1:
                    # stack K host batches -> ONE transfer + ONE dispatch
                    from .multi import stack_batches
                    put = lambda b: jax.device_put(b, self._stacked_sharding)
                    batch_iter = prefetch_to_device(
                        stack_batches(batcher.epoch(), k), put)
                else:
                    put = lambda b: jax.device_put(b, self._batch_sharding)
                    batch_iter = prefetch_to_device(batcher.epoch(), put)
                for batch in batch_iter:
                    self.components.invoke("batch_begin", self.steps, logs)
                    training_metrics = self.train_batch(batch)
                    for name, value in training_metrics.items():
                        logs[name].append(value)
                    self.components.invoke("batch_end", self.steps, logs)
                    epoch_batches += k
                    li = self.args.log_iters
                    if (not self.args.quiet_logs
                            # fire when the chunk [steps, steps+k) crosses
                            # a log_iters boundary (== steps % li == 0 at
                            # k == 1)
                            and ((self.steps + k - 1) // li
                                 > (self.steps - 1) // li)):
                        progress.update(self.steps, epoch_batches,
                                        self.args.batch_size,
                                        training_metrics)
                    self.steps += k

                progress.epoch_end()
                self.components.invoke(
                    "epoch_end", self.steps, self.epoch, logs)
                if self.epoch == 1 and self.args.cache_dataset:
                    if hasattr(self.dataset, "save_cache"):
                        self.dataset.save_cache(
                            self.dataset_cache_path(self.g.max_size))
                self.epoch += 1
        except KeyboardInterrupt:
            pass  # graceful interrupt (reference trainer.py:113-114)
        finally:
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)
        self.components.invoke("train_end", self.steps, logs)

    def train_batch(self, batch):
        """One device dispatch: a single fused step, or a K-step lax.scan
        chunk under --steps-per-call (train/multi.py). Returns device
        scalars — () leaves, or (K,) stacked — with no host sync here;
        callers convert only when they actually log. ``batch`` is None
        under --device-data: sampling happens inside the step."""
        # lazy R1 at --steps-per-call 1: alternate the two compiled steps
        # host-side on the global step counter (chunked paths alternate
        # in-graph via chunk_train_step's alt_step_fn)
        lazy = getattr(self, "_r1_interval", 1) > 1
        lazy_off = lazy and self.steps % self._r1_interval != 0
        # chunked lazy R1: the global step rides in as a traced scalar so
        # the in-scan cadence (step0 + i) % N is exact across chunk
        # boundaries for ANY K (ADVICE r3); a python int never recompiles
        step0 = (np.int32(self.steps),) if lazy and self.steps_per_call > 1 \
            else ()
        if batch is None:
            fn = (self._device_step_alt
                  if lazy_off and self.steps_per_call == 1
                  else self._device_step)
            self.state, metrics = fn(
                self.state, self._archive, self.next_key(), *step0)
        elif self.steps_per_call > 1:
            self.state, metrics = self._stacked_step(
                self.state, batch, self.next_key(), *step0)
        else:
            fn = self._train_step_alt if lazy_off else self._train_step
            self.state, metrics = fn(
                self.state, batch, self.next_key())
        return metrics

    @property
    def _stacked_step(self):
        """Jitted K-step chunk over stacked (K, B, ...) host batches."""
        if getattr(self, "_stacked_step_fn", None) is None:
            from .multi import chunk_train_step
            base = self.make_train_step()
            self._stacked_step_fn = jax.jit(
                chunk_train_step(
                    base, self.steps_per_call, "scan",
                    alt_step_fn=getattr(base, "no_r1", None),
                    alt_interval=getattr(base, "r1_interval", 1)),
                donate_argnums=(0,))
        return self._stacked_step_fn

    @property
    def _stacked_sharding(self):
        """Sharding for stacked (K, B, ...) batches: the batch axis (axis 1)
        shards over ``data``; the step axis is unsharded."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS
        return NamedSharding(self.mesh, P(None, DATA_AXIS))

    def _warn_chunk_cadence(self, k):
        """--steps-per-call moves the step counter K at a time; component
        frequencies that aren't multiples of K can only fire late (on the
        next chunk boundary). Surface that once, loudly."""
        if k <= 1:
            return
        for flag in ("log_iters", "gen_freq", "checkpoint_freq", "fid_freq"):
            freq = getattr(self.args, flag, None)
            if freq and freq % k:
                print(f"warning: --{flag.replace('_', '-')}={freq} is not a "
                      f"multiple of --steps-per-call={k}; it will fire on "
                      f"chunk boundaries only")

    # ------------------------------------------------------------- sampling
    def sample_z(self, n=None):
        if n is None:
            n = self.args.batch_size
        return jax.random.normal(
            self.next_key(), (n, self.gan_config.latent_dims), jnp.float32)

    def sample_g(self, n=None, target_g=False, z=None):
        """Generate images (NHWC float in [-1,1]) from random or given z.
        Under a multi-device mesh, z is sharded over the data axis when the
        sample count divides the mesh — the generated batch (and anything
        downstream, e.g. FID activations) then stays batch-sharded."""
        if z is None:
            z = self.sample_z(n)
        ndev = int(self.mesh.devices.size)
        if ndev > 1 and z.shape[0] % ndev == 0:
            z = jax.device_put(z, self._batch_sharding)
        params = (self.state.target_g_params if target_g
                  else self.state.g_params)
        return self._sample_apply(params, self.state.g_stats, z,
                                  self._g_rngs())

    def _g_rngs(self):
        """Extra rng collections for generator applies (scene noise)."""
        return {}

    # --------------------------------------------------------------- state
    def get_state(self):
        return dict(epoch=self.epoch, steps=self.steps)

    def set_state(self, state):
        for key, value in state.items():
            setattr(self, key, value)

    def checkpoint_artifacts(self):
        """name -> pytree map for the checkpoint component (mirrors the
        reference's g/g_target/d/opt_g/opt_d artifact set,
        components/model_checkpoint.py:36-42)."""
        s = self.state
        return {
            "g": {"params": s.g_params, "batch_stats": s.g_stats},
            "g_target": {"params": s.target_g_params},
            "d": {"params": s.d_params, "batch_stats": s.d_stats},
            "opt_g": s.opt_g,
            "opt_d": s.opt_d,
        }

    def load_checkpoint_artifacts(self, artifacts):
        s = self.state
        self.state = s.replace(
            g_params=artifacts["g"]["params"],
            g_stats=artifacts["g"]["batch_stats"],
            target_g_params=artifacts["g_target"]["params"],
            d_params=artifacts["d"]["params"],
            d_stats=artifacts["d"]["batch_stats"],
            opt_g=artifacts["opt_g"],
            opt_d=artifacts["opt_d"],
        )

    # ------------------------------------------------------------ plumbing
    def _save_cli_arguments(self):
        save_cli_arguments(f"{self.output_root}/config.args",
                           argv=getattr(self.args, "_argv", None))

    def _generate_run_id(self, suffix_len=6):
        now = datetime.now().strftime("%Y-%m-%d_%H-%M-%S")
        random_suffix = "".join(random.sample(string.ascii_letters, suffix_len))
        return f"{now}_{random_suffix}"

    @property
    def output_root(self):
        return f"{self.args.output}/{self.run_id}"

    def put_replicated(self, tree):
        return jax.device_put(tree, self._replicated)

    def put_state(self, tree):
        """Place the train state on the mesh: replicated under pure data
        parallelism; with --tp, weight tensors shard their output-feature
        dim over the model axis (tensor parallelism via GSPMD)."""
        if getattr(self.args, "tp", 1) > 1:
            return param_sharding(tree, self.mesh)
        return self.put_replicated(tree)

    def init_device(self):
        """Context manager pinning model init to the CPU backend — eager
        init through a TPU AOT compiler costs minutes; the resulting
        arrays migrate to the mesh via put_replicated anyway."""
        import contextlib
        try:
            return jax.default_device(jax.devices("cpu")[0])
        except RuntimeError:
            return contextlib.nullcontext()

    # ----------------------------------------------------------------- CLI
    @classmethod
    def get_component_classes(cls, args):
        from .components.image_sampler import ImageSamplerComponent
        from .components.model_checkpoint import ModelCheckpointComponent
        classes = [ImageSamplerComponent, ModelCheckpointComponent]

        if args.profile_dir or args.timing:
            from .components.profiler import ProfilerComponent
            classes.append(ProfilerComponent)

        if args.fid:
            from .components.metrics.fid import FIDComponent
            classes.append(FIDComponent)

        if args.metrics_collector:
            from .components.metrics import (
                KatibMetricsComponent,
                KubeflowMetricsComponent,
                TensorboardComponent,
            )
            classes.append({
                "katib": KatibMetricsComponent,
                "kubeflow": KubeflowMetricsComponent,
                "tensorboard": TensorboardComponent,
            }[args.metrics_collector])
        return classes

    @classmethod
    def create_from_cli(cls, argv=None):
        """Two-pass parser assembly so the selected components can register
        their own flags (reference trainer.py:236-267)."""
        base_parser = argparse.ArgumentParser(
            description="TartanGAN-TPU trainer", fromfile_prefix_chars="@"
        )
        cls.add_args_to_parser(base_parser)
        base_args = base_parser.parse_known_args(argv)[0]

        component_classes = cls.get_component_classes(base_args)
        full_parser = argparse.ArgumentParser(
            description="TartanGAN-TPU trainer", fromfile_prefix_chars="@"
        )
        cls.add_args_to_parser(full_parser)
        for component_class in component_classes:
            component_class.add_args_to_parser(full_parser)
        args = full_parser.parse_args(argv)
        args._argv = list(argv) if argv is not None else None

        print(f'Using JAX backend "{jax.default_backend()}" '
              f'({len(jax.devices())} device(s))')
        components = [cc(args) for cc in component_classes]
        return cls(args, components)

    @classmethod
    def add_args_to_parser(cls, p):
        # flag set mirrors reference trainer.py:269-313 (device flags swapped
        # for TPU-native ones)
        p.add_argument("data_path")
        p.add_argument("--batch-size", type=int, default=128)
        p.add_argument("--gen-freq", type=int, default=200,
                       help="Output samples every N batches")
        p.add_argument("--lr-g", type=float, default=1e-4,
                       help="Learning rate for the generator")
        p.add_argument("--lr-d", type=float, default=4e-4,
                       help="Learning rate for the discriminator")
        p.add_argument("--lr-target-g", type=float, default=1e-3,
                       help="EMA factor for the target generator")
        p.add_argument("--epochs", type=int, default=10000)
        p.add_argument("--output", default="output",
                       help="Root of output locations. A path segment unique "
                            "to the run will be appended.")
        p.add_argument("--dataset-cache", default="cache/{root}_{size}.pkl",
                       help="Location of dataset cache for ImageFolderDataset")
        p.add_argument("--grad-penalty", type=float, default=5.0,
                       help="R1 gradient penalty weight on real data")
        p.add_argument("--config", default="64",
                       help="Id of model configuration (see configs.py)")
        p.add_argument("--model-scale", type=float, default=1.0,
                       help="Multiply all layer widths by this factor")
        p.add_argument("--cache-dataset", action="store_true",
                       help="Enable dataset caching with ImageFolderDataset")
        p.add_argument("--g-base", default="mlp",
                       help="Generator latent input: 'mlp' or 'tiledz'")
        p.add_argument("--norm", default="bn",
                       help="Normalization: 'bn' (batchnorm) or 'id'")
        p.add_argument("--activation", default="relu",
                       help="Activation: 'relu', 'selu' or 'elu'")
        p.add_argument("--quiet-logs", action="store_true",
                       help="Reduce log output")
        p.add_argument("--log-iters", type=int, default=100,
                       help="Progress logging frequency in steps")
        p.add_argument("--log-progress-newlines", action="store_true",
                       help="Emit each progress refresh on its own line "
                            "(k8s-log-friendly) instead of rewriting one "
                            "line in place")
        p.add_argument("--metrics-collector", default=None,
                       help="Metric collector: katib, kubeflow, tensorboard")
        p.add_argument("--run-id", type=type_or_none(str), default=None,
                       help="Explicit run id (otherwise generated)")
        p.add_argument("--fid", action="store_true",
                       help="Calculate FID test metric")
        p.add_argument("--profile-dir", type=type_or_none(str), default=None,
                       help="Capture a JAX device trace into this directory")
        p.add_argument("--timing", action="store_true",
                       help="Log images/sec throughput to the metrics logs")
        p.add_argument("--r1-interval", type=int, default=1,
                       help="Lazy R1 regularization (StyleGAN2 practice; "
                            "departs from the reference's every-step "
                            "penalty): apply the R1 double-backward every "
                            "N steps with weight grad_penalty*N — the "
                            "penalty is 22%% of the '128' step cost "
                            "(docs/PERF.md). 1 = exact reference "
                            "semantics; the cadence is exact for any "
                            "--steps-per-call")
        p.add_argument("--iters-d", type=int, default=1,
                       help="Discriminator updates per generator update")
        p.add_argument("--remat", action="store_true",
                       help="Rematerialize residual blocks in the backward "
                            "pass (saves HBM at high resolutions)")
        p.add_argument("--remat-policy", default="full",
                       choices=("full", "convs", "dots"),
                       help="With --remat: what jax.checkpoint may save. "
                            "'full' recomputes everything; 'convs' saves "
                            "the main-path conv outputs and recomputes "
                            "only the norm/act chains (less backward "
                            "FLOPs, most of the memory win); 'dots' is "
                            "jax's stock dot-saving policy")
        p.add_argument("--parity-blocks", default="auto",
                       choices=("auto", "on", "off"),
                       help="Compute thin tower blocks in the sub-pixel "
                            "parity domain (4x MXU lane occupancy; "
                            "ops/parity.py). auto = on for TPU")
        # TPU-native flags
        p.add_argument("--steps-per-call", type=int, default=1,
                       help="Fold K train steps into one jitted lax.scan "
                            "dispatch (amortizes per-dispatch overhead; "
                            "metrics log as (K,) chunks; component "
                            "frequencies should be multiples of K). With "
                            "--device-data batches sample on-chip inside "
                            "the scan; otherwise K host batches stack into "
                            "one transfer")
        p.add_argument("--device-data", action="store_true",
                       help="Keep the whole uint8 archive resident in HBM "
                            "and sample/crop batches inside the jitted step "
                            "(zero per-step host->device transfers; uniform-"
                            "with-replacement sampling; bytes-archive "
                            "datasets only)")
        p.add_argument("--dtype", default="auto",
                       choices=["auto", "bf16", "f32"],
                       help="Compute dtype (params always f32)")
        p.add_argument("--num-devices", type=type_or_none(int), default=None,
                       help="Devices in the data mesh (default: all)")
        p.add_argument("--tp", type=int, default=1,
                       help="Tensor-parallel degree: shard weight output "
                            "channels over a 2-D (data, model) mesh")
        p.add_argument("--seed", type=int, default=0)
        p.add_argument("--ema-start", default="copy",
                       choices=["copy", "reference"],
                       help="'copy' initializes target-G = G; 'reference' "
                            "replicates the reference bug where the initial "
                            "'copy' is a single 1e-3 EMA step from random "
                            "init (trainers/cnn.py:95,158-165)")


if __name__ == "__main__":
    trainer = Trainer.create_from_cli()
    trainer.train()
