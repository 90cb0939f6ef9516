"""Model bundle: modules + parameters + tokenizer for one SD configuration.

Replaces the reference's `models.load_sd` EasyDict + module-level globals
(reference models/models.py:11-61). A bundle is explicit and immutable; params
come from a converted HF checkpoint directory when one is available, else
from deterministic random initialization (weightless mode — used for perf
benchmarking, sharding validation, and tests; generation quality requires
converted weights).

Prompt encoding parity: models/models.py:63-109 — CLIP max-length padding,
uncond = negative-prompt embedding, `one_uncond_input_only` mode.
"""

from __future__ import annotations

import functools
import os
from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SDConfig, SD_CONFIGS
from ..nn.clip import CLIPTextEncoder
from ..nn.unet import PositionNet, UNet2DCondition
from ..nn.vae import AutoencoderKL
from ..text import tokens as toklib


@dataclass(frozen=True)
class ModelBundle:
    config: SDConfig
    tokenizer: Any
    unet: UNet2DCondition
    text_encoder: CLIPTextEncoder
    vae: AutoencoderKL
    position_net: PositionNet | None
    params: dict  # {"unet", "text", "vae"[, "text2"][, "position_net"]}
    # SDXL-base second tower (bigG): context = concat of both towers'
    # penultimate states; pooled comes from this tower's projection.
    text_encoder_2: CLIPTextEncoder | None = None
    # The converted checkpoint the params came from; None = deterministic
    # random init (weightless mode). Lets drivers distinguish a real-weights
    # run (e.g. to require a real segmenter) from a perf/test run.
    checkpoint_dir: str | None = None

    @property
    def latent_shape(self):
        return (1, self.config.latent_height, self.config.latent_width, 4)


# Module names (substring match, lowercase) whose params must stay f32
# because the layer computes in f32. Every f32-compute layer in the bundle's
# modules (unet/clip/vae GroupNorm+LayerNorm) matches "norm"; any new
# f32-compute layer added to the bundle must be named to match this list
# (or the list extended), else its params get wrongly cast to bf16.
_F32_PARAM_NAME_MARKERS = ("norm",)


def cast_params_for_inference(params: dict, dtype) -> dict:
    """Store matmul/conv params in the compute dtype (norm params stay f32).

    Modules built with dtype=bfloat16 cast their f32 params to bf16 at every
    use; storing them bf16 up front is numerically equivalent for layers that
    promote params to the compute dtype before use (the same round-to-nearest
    cast happens either way). Layers that consume raw f32 params in f32
    arithmetic before an explicit cast (e.g. CLIP position embeddings added
    to token embeddings) can differ in the last bf16 bit. Norm layers compute
    in f32, so their scale/bias stay f32 (see _F32_PARAM_NAME_MARKERS)."""

    def walk(tree, in_f32_layer):
        if isinstance(tree, dict):
            return {
                k: walk(v, in_f32_layer
                        or any(m in k.lower() for m in _F32_PARAM_NAME_MARKERS))
                for k, v in tree.items()
            }
        if in_f32_layer or tree.dtype != jnp.float32:
            return tree
        return tree.astype(dtype)

    return walk(params, False)


def _storage_cast_enabled(config: SDConfig) -> bool:
    return (config.jnp_dtype() == jnp.bfloat16
            and os.environ.get("LMDX_PARAM_STORAGE", "compute") != "float32")


def _random_init_params(module, rng, *args, storage_dtype=None, **kwargs):
    # Jit the whole init: executed eagerly, a full-SD init dispatches ~10^3
    # individual ops, which is pathologically slow over the remote-TPU
    # tunnel (each eager dispatch is a round trip).
    #
    # storage_dtype fuses the inference-storage cast INTO the init program:
    # casting afterwards in a separate jit holds the full f32 tree and the
    # cast tree live at once — at SDXL-refiner scale that is ~18 GiB and
    # OOMs the 16 GiB chip (observed round 5). Fused, XLA frees each f32
    # param as soon as its cast consumes it, so peak ≈ the cast tree.
    if storage_dtype is None:
        return jax.jit(module.init)(rng, *args, **kwargs)["params"]

    def init_cast(rng, *a, **kw):
        return cast_params_for_inference(
            module.init(rng, *a, **kw)["params"], storage_dtype)

    return jax.jit(init_cast)(rng, *args, **kwargs)


@functools.partial(jax.jit, static_argnames=("module", "eos_token_id"))
def _text_apply(module, params, ids, eos_token_id):
    return module.apply({"params": params}, ids, eos_token_id=eos_token_id)


@functools.partial(jax.jit, static_argnames=("module",))
def _position_net_apply(module, params, boxes, masks, embs):
    return module.apply({"params": params}, boxes, masks, embs)


def build_modules(config: SDConfig):
    dtype = config.jnp_dtype()
    unet = UNet2DCondition(config.unet, dtype=dtype)
    text_encoder = CLIPTextEncoder(config.clip, dtype=dtype)
    vae = AutoencoderKL(config.vae, dtype=dtype)
    position_net = None
    if config.unet.use_gligen:
        position_net = PositionNet(
            positive_len=config.clip.hidden_size,
            out_dim=config.unet.cross_attention_dim,
            fourier_freqs=config.unet.gligen_fourier_freqs,
            dtype=dtype,
        )
    return unet, text_encoder, vae, position_net


def build_text_encoder_2(config: SDConfig) -> CLIPTextEncoder | None:
    if config.clip2 is None:
        return None
    return CLIPTextEncoder(config.clip2, dtype=config.jnp_dtype())


def init_random_params(config: SDConfig, seed: int = 0,
                       storage_dtype=None) -> dict:
    """Deterministic random params for weightless operation.

    storage_dtype: fuse the inference-storage cast into each component's
    init program (see _random_init_params) — values are identical to
    casting afterwards (same f32 RNG draws, same round-to-nearest)."""
    unet, text_encoder, vae, position_net = build_modules(config)
    h, w = config.latent_height, config.latent_width
    d = config.unet.cross_attention_dim
    key = jax.random.key(seed)
    k_unet, k_text, k_vae, k_pn = jax.random.split(key, 4)

    latents = jnp.zeros((1, h, w, 4), jnp.float32)
    text = jnp.zeros((1, toklib.MAX_LENGTH, d), jnp.float32)
    objs = (
        jnp.zeros((1, config.unet.gligen_max_objs, d), jnp.float32)
        if config.unet.use_gligen
        else None
    )
    added = {}
    if config.unet.addition_embed_type == "text_time":
        pooled_dim = config.pooled_dim
        num_ids = (config.unet.projection_class_embeddings_input_dim
                   - pooled_dim) // config.unet.addition_time_embed_dim
        added = {
            "added_text_embeds": jnp.zeros((1, pooled_dim), jnp.float32),
            "added_time_ids": jnp.zeros((1, num_ids), jnp.float32),
        }
    sd = storage_dtype
    params = {
        "unet": _random_init_params(unet, k_unet, latents, jnp.zeros((1,), jnp.int32),
                                    text, objs=objs, storage_dtype=sd, **added),
        "text": _random_init_params(
            text_encoder, k_text,
            jnp.zeros((1, toklib.MAX_LENGTH), jnp.int32), storage_dtype=sd,
        ),
        # Init through the full encode+decode round-trip so both halves (and
        # the quant convs) get parameters.
        "vae": _random_init_params(vae, k_vae, jnp.zeros((1, 64, 64, 3), jnp.float32),
                                   storage_dtype=sd),
    }
    text_encoder_2 = build_text_encoder_2(config)
    if text_encoder_2 is not None:
        params["text2"] = _random_init_params(
            text_encoder_2, jax.random.fold_in(key, 5),
            jnp.zeros((1, toklib.MAX_LENGTH), jnp.int32), storage_dtype=sd,
        )
    if position_net is not None:
        params["position_net"] = _random_init_params(
            position_net, k_pn,
            jnp.zeros((1, config.unet.gligen_max_objs, 4), jnp.float32),
            jnp.zeros((1, config.unet.gligen_max_objs), jnp.float32),
            jnp.zeros((1, config.unet.gligen_max_objs, config.clip.hidden_size),
                      jnp.float32),
            storage_dtype=sd,
        )
    return params


@functools.lru_cache(maxsize=4)
def load_bundle(
    model_key: str = "gligen/diffusers-generation-text-box",
    checkpoint_dir: str | None = None,
    seed: int = 0,
    dtype: str | None = None,
) -> ModelBundle:
    """Build a ModelBundle for `model_key`.

    checkpoint_dir: a converted-or-HF checkpoint directory; when None, uses
    $LMDX_CHECKPOINT_DIR/<model_key> if present, else random params.
    dtype: compute-dtype override ("float32"/"bfloat16"). The default
    (bfloat16) is the TPU equivalent of the reference's autocast-fp16 mode
    (lmd_plus.py:227); "float32" matches the reference's no-autocast
    configuration (lmd.py:254, the published training-free-LMD precision).
    """
    import dataclasses as _dc

    config = SD_CONFIGS[model_key]()
    if dtype is not None:
        config = _dc.replace(config, dtype=dtype)
    unet, text_encoder, vae, position_net = build_modules(config)

    if checkpoint_dir is None:
        root = os.environ.get("LMDX_CHECKPOINT_DIR", "")
        candidate = os.path.join(root, model_key.replace("/", "--")) if root else ""
        if candidate and os.path.isdir(candidate):
            checkpoint_dir = candidate

    tokenizer = toklib.default_tokenizer()
    if checkpoint_dir is not None:
        from . import convert

        tok_dir = os.path.join(checkpoint_dir, "tokenizer")
        if os.path.exists(os.path.join(tok_dir, "vocab.json")):
            tokenizer = toklib.ClipBpeTokenizer.from_dir(tok_dir)
        elif (config.clip.vocab_size >= toklib.BOS_ID
              and not os.environ.get("LMDX_ALLOW_WORD_TOKENIZER")):
            # Real-vocab weights with the hash-based WordTokenizer would
            # silently scramble every prompt (ids are md5 hashes, not CLIP
            # BPE ids). Hard-fail rather than generate garbage. Checked
            # before the param load so the error is immediate.
            raise ValueError(
                f"checkpoint {checkpoint_dir!r} has no tokenizer/vocab.json; "
                "refusing to pair converted real-vocab weights with the "
                "hash-based WordTokenizer. Copy the CLIP tokenizer files "
                "(vocab.json + merges.txt) into <checkpoint>/tokenizer/, or "
                "set LMDX_ALLOW_WORD_TOKENIZER=1 to override for debugging."
            )
        params = convert.load_checkpoint(config, checkpoint_dir)
        if _storage_cast_enabled(config):
            # Host-side cast BEFORE upload: casting on device holds the f32
            # and bf16 trees live at once (~18 GiB at SDXL scale — OOMs the
            # 16 GiB chip), and uploading f32 costs 2× the tunnel time of
            # the bf16 tree it immediately becomes. The converters return
            # host numpy; numpy .astype(ml_dtypes.bfloat16) rounds
            # to-nearest-even exactly like the on-device convert.
            params = cast_params_for_inference(params, jnp.bfloat16)
        params = jax.device_put(params)
    else:
        # Fused init+cast (see _random_init_params): never materializes the
        # full f32 tree on device.
        params = init_random_params(
            config, seed=seed,
            storage_dtype=(jnp.bfloat16 if _storage_cast_enabled(config)
                           else None))

    return ModelBundle(
        config=config,
        tokenizer=tokenizer,
        unet=unet,
        text_encoder=text_encoder,
        vae=vae,
        position_net=position_net,
        params=params,
        text_encoder_2=build_text_encoder_2(config),
        checkpoint_dir=checkpoint_dir,
    )


def _bucket(n: int) -> int:
    """Next power-of-two batch bucket — keeps the number of compiled batch
    shapes logarithmic in the box count instead of one per distinct N."""
    b = 1
    while b < n:
        b *= 2
    return b


def encode_text(bundle: ModelBundle, texts: list[str]):
    """Encode raw texts -> (hidden (N, 77, D), pooled (N, Dp)).

    Single tower: (last or penultimate hidden, pooled EOS embedding).
    Dual towers (SDXL-base): hidden = concat of both towers' penultimate
    states along features (CLIP-L 768 | bigG 1280 = 2048); pooled = the
    second tower's projected embedding — the diffusers SDXL conditioning.
    """
    n = len(texts)
    ids = np.asarray(
        [bundle.tokenizer.encode(t, pad_to=toklib.MAX_LENGTH) for t in texts]
        + [[bundle.tokenizer.eos_id] * toklib.MAX_LENGTH] * (_bucket(n) - n),
        np.int32,
    )
    # Reduced-vocab test configs only: fold ids into the model's vocab
    # (out-of-range embedding lookups fill with NaN in jax). Real CLIP
    # vocabs (>= BOS_ID entries) cover every tokenizer id, and folding
    # there would scramble prompts — so it is gated, not unconditional.
    vocab = bundle.config.clip.vocab_size
    eos_id = bundle.tokenizer.eos_id
    if vocab < toklib.BOS_ID:
        ids = ids % vocab
        eos_id = eos_id % vocab
    hidden, pooled = _text_apply(
        bundle.text_encoder, bundle.params["text"], jnp.asarray(ids), eos_id,
    )
    if bundle.text_encoder_2 is not None:
        hidden2, pooled2 = _text_apply(
            bundle.text_encoder_2, bundle.params["text2"], jnp.asarray(ids),
            eos_id,
        )
        hidden = jnp.concatenate([hidden, hidden2], axis=-1)
        pooled = pooled2
    return hidden[:n].astype(jnp.float32), pooled[:n].astype(jnp.float32)


def encode_prompts(
    bundle: ModelBundle,
    prompts: list[str],
    negative_prompt: str = "",
    one_uncond_input_only: bool = False,
):
    """(uncond_embeddings, cond_embeddings) for CFG sampling.

    uncond is the embedding of `negative_prompt`, repeated per prompt unless
    one_uncond_input_only (reference models/models.py:63-89).
    """
    cond, _ = encode_text(bundle, prompts)
    uncond, _ = encode_text(bundle, [negative_prompt])
    if not one_uncond_input_only:
        uncond = jnp.repeat(uncond, len(prompts), axis=0)
    return uncond, cond


def gligen_objs(bundle: ModelBundle, boxes, masks, phrase_embeddings):
    """PositionNet forward: packed GLIGEN condition -> grounding tokens."""
    assert bundle.position_net is not None, "model has no GLIGEN adapters"
    return _position_net_apply(
        bundle.position_net, bundle.params["position_net"],
        jnp.asarray(boxes, jnp.float32),
        jnp.asarray(masks, jnp.float32),
        jnp.asarray(phrase_embeddings, jnp.float32),
    )
