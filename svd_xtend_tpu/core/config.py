"""Model / training configuration dataclasses.

The reference (pixeli99/SVD_Xtend) carries configuration implicitly in the
pretrained checkpoint configs and ~40 argparse flags (train_svd.py:294-569).
Here everything is explicit, hashable (so it can be a static jit argument),
and serializable to JSON for checkpoint round-trips.

Defaults reproduce the SVD checkpoint config vendored at
reference ``src/unet_spatio_temporal_condition.py:70-96``.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Optional, Tuple


def _asdict(cfg: Any) -> dict:
    return dataclasses.asdict(cfg)


class _JsonMixin:
    def to_json(self) -> str:
        return json.dumps(_asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_dict(cls, d: dict):
        names = {f.name for f in dataclasses.fields(cls)}
        kwargs = {}
        for k, v in d.items():
            if k not in names:
                continue
            if isinstance(v, list):
                v = tuple(tuple(x) if isinstance(x, list) else x for x in v)
            kwargs[k] = v
        return cls(**kwargs)

    @classmethod
    def from_json(cls, s: str):
        return cls.from_dict(json.loads(s))


@dataclasses.dataclass(frozen=True)
class UNetConfig(_JsonMixin):
    """Spatio-temporal conditional UNet (SVD architecture).

    Field semantics mirror the checkpoint config the reference loads
    (reference src/unet_spatio_temporal_condition.py:70-96); the module
    tree that consumes them is a fresh JAX design (see models/unet.py).
    """

    sample_size: int = 96
    in_channels: int = 8          # 4 noisy latent + 4 concat first-frame cond
    out_channels: int = 4
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlockSpatioTemporal",
        "CrossAttnDownBlockSpatioTemporal",
        "CrossAttnDownBlockSpatioTemporal",
        "DownBlockSpatioTemporal",
    )
    up_block_types: Tuple[str, ...] = (
        "UpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
        "CrossAttnUpBlockSpatioTemporal",
    )
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 768  # 3 * 256
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    transformer_layers_per_block: Tuple[int, ...] = (1, 1, 1, 1)
    num_attention_heads: Tuple[int, ...] = (5, 10, 20, 20)
    num_frames: int = 25
    resnet_eps: float = 1e-5
    norm_eps: float = 1e-6        # GroupNorm inside transformer models
    dropout: float = 0.0
    # feed-forward chunking over the token axis — the reference's
    # enable_forward_chunking memory knob
    # (src/unet_spatio_temporal_condition.py:328-355); 0 disables
    ff_chunk_size: int = 0
    # Tracklet2Video (bbox-conditioned) branch: 0 disables (README.md:57-70)
    tracklet_dim: int = 0
    tracklet_heads: int = 8
    # gate init for the GLIGEN-style injections: 0.0 = exact no-op at init
    # (the Boximator contract — safe on a pretrained backbone). A small
    # warm value (e.g. 0.5) escapes the zero-gate cold start when training
    # the branch jointly with a NON-pretrained backbone, where the
    # optimizer otherwise learns to ignore the box tokens before the gates
    # open (measured: scripts/eval_tracklet.py, r5)
    tracklet_gate_init: float = 0.0

    def __post_init__(self):
        # constructor guardrails (reference src/unet_spatio_temporal_condition.py:102-125
        # raises on mismatched per-block tuple lengths; :889-894 checks the
        # add-embedding input dim = 3 sinusoid chunks)
        n = len(self.block_out_channels)
        if not (len(self.down_block_types) == len(self.up_block_types) == n
                == len(self.num_attention_heads)
                == len(self.transformer_layers_per_block)):
            raise ValueError(
                "down/up_block_types, block_out_channels, num_attention_heads "
                "and transformer_layers_per_block must all have equal length")
        if self.projection_class_embeddings_input_dim != 3 * self.addition_time_embed_dim:
            raise ValueError(
                "projection_class_embeddings_input_dim must equal "
                "3 * addition_time_embed_dim ([fps, motion_bucket, noise_aug])")

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4

    def scaled(self, factor: int) -> "UNetConfig":
        """A tiny config for tests: divide all widths by `factor`."""
        return dataclasses.replace(
            self,
            block_out_channels=tuple(max(32, c // factor) for c in self.block_out_channels),
            num_attention_heads=tuple(max(1, h // factor) for h in self.num_attention_heads),
            cross_attention_dim=max(32, self.cross_attention_dim // factor),
            addition_time_embed_dim=max(8, self.addition_time_embed_dim // factor),
            projection_class_embeddings_input_dim=3 * max(8, self.addition_time_embed_dim // factor),
        )


TINY_UNET = UNetConfig(
    sample_size=8,
    block_out_channels=(32, 64),
    down_block_types=("CrossAttnDownBlockSpatioTemporal", "DownBlockSpatioTemporal"),
    up_block_types=("UpBlockSpatioTemporal", "CrossAttnUpBlockSpatioTemporal"),
    layers_per_block=1,
    transformer_layers_per_block=(1, 1),
    num_attention_heads=(2, 4),
    cross_attention_dim=32,
    addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=24,
    num_frames=2,
)


@dataclasses.dataclass(frozen=True)
class VAEConfig(_JsonMixin):
    """KL autoencoder with per-frame 2D encoder and temporal (Conv3d) decoder.

    Behavior contract: reference drives diffusers AutoencoderKLTemporalDecoder
    (train_svd.py:649-650, encode at :287, chunked temporal decode at :1135).
    """

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    scaling_factor: float = 0.18215
    norm_eps: float = 1e-6
    # decoder: UpBlockTemporalDecoder resnet count = layers_per_block + 1
    sample_size: int = 768

    @property
    def downsample_factor(self) -> int:
        """Spatial pixels-per-latent (8 for the SVD VAE's 4 stages)."""
        return 2 ** (len(self.block_out_channels) - 1)

    def scaled(self, factor: int) -> "VAEConfig":
        return dataclasses.replace(
            self,
            block_out_channels=tuple(max(32, c // factor) for c in self.block_out_channels),
        )


TINY_VAE = VAEConfig(block_out_channels=(32, 64), layers_per_block=1)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig(_JsonMixin):
    """CLIP ViT vision tower with projection (CLIP-ViT-H/14 defaults).

    Behavior contract: transformers CLIPVisionModelWithProjection as loaded at
    reference train_svd.py:643-648 and used at :857-876 — 224x224 inputs,
    projected pooled embedding of dim `projection_dim` (the single
    cross-attention token).
    """

    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1280
    num_layers: int = 32
    num_heads: int = 16
    intermediate_size: int = 5120
    projection_dim: int = 1024
    layer_norm_eps: float = 1e-5
    hidden_act: str = "gelu"
    image_mean: Tuple[float, float, float] = (0.48145466, 0.4578275, 0.40821073)
    image_std: Tuple[float, float, float] = (0.26862954, 0.26130258, 0.27577711)


TINY_CLIP = CLIPVisionConfig(
    image_size=28, patch_size=14, hidden_size=32, num_layers=2, num_heads=2,
    intermediate_size=64, projection_dim=32,
)


@dataclasses.dataclass(frozen=True)
class SchedulerConfig(_JsonMixin):
    """EulerDiscreteScheduler in EDM/Karras mode.

    Behavior contract: the scheduler the SVD pipeline instantiates
    (reference train_svd.py:49 import; driven at :1130-1140) — Karras sigma
    schedule, sigma_max ~ 700, timestep = 0.25*log(sigma) ("continuous" /
    trailing EDM convention).
    """

    num_train_timesteps: int = 1000
    sigma_min: float = 0.002
    sigma_max: float = 700.0
    rho: float = 7.0


@dataclasses.dataclass(frozen=True)
class PipelineConfig(_JsonMixin):
    """Operating point of the img2vid pipeline (infer_svd.ipynb / validation)."""

    height: int = 320
    width: int = 512
    num_frames: int = 14
    num_inference_steps: int = 25
    min_guidance_scale: float = 1.0
    max_guidance_scale: float = 3.0
    fps: int = 7
    fps_offset: int = 1           # upstream pipeline embeds fps-1; training fed raw fps
    motion_bucket_id: int = 127
    noise_aug_strength: float = 0.02
    decode_chunk_size: int = 8
    # approximate acceleration (OPT-IN; 1 = exact): recompute the CFG
    # unconditional branch only every k-th Euler step and reuse it between —
    # the uncond prediction drifts slowly across adjacent sigmas, so k=2/3
    # trades a small guidance lag for ~25/33% less UNet work per video
    uncond_reuse_interval: int = 1
    # approximate acceleration (OPT-IN; None = exact): "int8" runs spatial
    # convs W8A8 on the int8 MXU path where a measured per-shape table says
    # it wins (ops/quant.py) — unet_quant scopes the denoising UNet,
    # vae_quant the temporal decoder. Validate quality on real weights
    # before production use.
    unet_quant: Optional[str] = None
    vae_quant: Optional[str] = None
    # approximate acceleration (OPT-IN; 1 = exact): DeepCache-style deep-
    # feature reuse (models/unet.py) — every N-th Euler step runs the full
    # UNet and caches the deep trunk (the input of up block
    # n_up - deep_cache_depth); the steps between recompute only the
    # high-res levels [0, depth) around the cached trunk. Composes with
    # uncond_reuse_interval (per-branch caches) and the int8 paths.
    deep_cache_interval: int = 1
    deep_cache_depth: int = 1


# Named operating points (BASELINE.md): A = the README comparison grids
# (reference README.md:17-20), NOTEBOOK = infer_svd.ipynb cell 2, XT = the
# SVD-XT 25-frame decode config (BASELINE.json configs #4).
OPERATING_POINT_A = PipelineConfig(height=320, width=512, num_frames=14,
                                   noise_aug_strength=0.0)
OPERATING_POINT_NOTEBOOK = PipelineConfig(height=576, width=1024, num_frames=14,
                                          num_inference_steps=30, fps=8)
OPERATING_POINT_XT = PipelineConfig(height=576, width=1024, num_frames=25)


@dataclasses.dataclass(frozen=True)
class MeshConfig(_JsonMixin):
    """Device-mesh layout. axis sizes of -1 mean "fill with what's left"."""

    data: int = -1     # DP: batch sharding, ZeRO-1 optimizer-state sharding
    model: int = 1     # TP: attention heads / MLP channels
    frames: int = 1    # SP: frame-axis sharding (temporal attention/convs
                       # gathered by GSPMD collectives — SURVEY.md §2.5)


@dataclasses.dataclass(frozen=True)
class TrainConfig(_JsonMixin):
    """Training hyperparameters — the reference's flag surface
    (train_svd.py:294-569) minus torch-isms, plus TPU-native knobs."""

    # data
    base_folder: str = ""
    width: int = 512
    height: int = 320
    num_frames: int = 14
    per_device_batch_size: int = 1
    num_workers: int = 8
    # frame-chunked VAE encode in the loss (TPU-native knob): the 2D encoder
    # is strictly per-frame, so chunking is exact; unchunked, the encoder's
    # top-level activations at 512x320x14f are ~3 GB bf16 PER TENSOR and
    # blow the 16 GB/chip HBM before the UNet even runs (the reference
    # encodes all frames at once on an 80 GB A100, train_svd.py:948).
    # 0 = unchunked. NOTE (ADVICE r4): chunked encode draws the posterior
    # noise per chunk, so the training RNG draw ORDER differs from the
    # unchunked (reference-matching) form — runs are reproducible at a
    # fixed chunk size but not bit-comparable across chunk sizes. Set 0 on
    # high-memory/multi-chip meshes to match the reference draw order; the
    # default 8 is what fits one 16 GB chip at 512x320x14f (PERF.md).
    encode_chunk_size: int = 8
    # optimization
    learning_rate: float = 1e-4
    scale_lr: bool = False
    lr_scheduler: str = "constant"      # linear|cosine|cosine_with_restarts|polynomial|constant|constant_with_warmup
    lr_warmup_steps: int = 500
    max_train_steps: int = 50000
    gradient_accumulation_steps: int = 1
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_weight_decay: float = 1e-2
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    use_8bit_adam: bool = False         # blockwise-int8 Adam moments (train/quant.py)
    zero1: bool = False                 # ZeRO-1: shard Adam moments + EMA over 'data'
    # park fp32 masters (and Adam moments) in TPU host memory (pinned_host),
    # streamed over PCIe per step — the single-chip lever for full-FT's
    # >16 GB device footprint: 'none' | 'masters' | 'masters+moments'
    # (parallel/sharding.py state_shardings; probe_host_offload.py measured
    # the relay exposes pinned_host at ~5.3 GB/s)
    host_offload: str = "none"
    # EDM
    p_mean: float = 0.7
    p_std: float = 1.6
    cond_aug_loc: float = -3.0
    cond_aug_std: float = 0.5
    conditioning_dropout_prob: float = 0.1
    # trainable scope: 'full' | 'temporal' | 'lora' | 'tracklet'
    train_mode: str = "temporal"
    lora_rank: int = 4
    lora_alpha: int = 4
    # Tracklet2Video finetuning ('tracklet' mode trains only the box branch:
    # tokenizer + instance enhancer + zero-gated injections)
    tracklet_dim: int = 0               # >0 enables the UNet box branch
    tracklet_gate_init: float = 0.0     # UNetConfig.tracklet_gate_init passthrough
    max_boxes: int = 16                 # per-frame box slots (dataset padding)
    # EMA
    use_ema: bool = False
    ema_decay: float = 0.9999
    # precision
    mixed_precision: str = "bf16"       # no|bf16
    # gradient storage dtype. "fp32" (default) keeps the exact cotangent of
    # the fp32 masters; "bf16" differentiates w.r.t. the bf16 compute copy
    # of the params (AMP convention — backward math is bf16 either way, this
    # only changes the dtype the final per-param cotangent is STORED in),
    # halving the transient grad tree. NOTE the measured full-FT caveat
    # (PERF.md "Training throughput"): the bf16 param copy becomes a live
    # differentiation root held across the whole backward, so for the FULL
    # scope the net peak-HBM change is ~zero (compiler-measured 20.8 vs
    # 19.3 GB at full size) — the option pays off when the trainable tree
    # is small relative to activations (temporal/lora), not for full-FT.
    # Masters stay fp32 in every case.
    grad_dtype: str = "fp32"            # fp32|bf16
    # checkpointing
    output_dir: str = "./outputs"
    checkpointing_steps: int = 500
    checkpoints_total_limit: int = 2
    resume_from_checkpoint: str = ""    # path or 'latest'
    validation_steps: int = 500
    num_validation_images: int = 1
    # misc
    seed: int = 123
    report_to: str = "tensorboard"
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    # performance
    remat_policy: str = "block"         # none|block|outer (models/unet.py); legacy 'full'≡'block'
    vae_encode_in_loop: bool = True     # False => latents precomputed by data pipeline

    @classmethod
    def from_dict(cls, d: dict):
        d = dict(d)
        if isinstance(d.get("mesh"), dict):
            d["mesh"] = MeshConfig.from_dict(d["mesh"])
        return super(TrainConfig, cls).from_dict(d)
