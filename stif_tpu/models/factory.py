"""Network factory (reference ``codes/models/networks.py:8-26`` define_G).

Note the reference maps 'LIIF' -> the *test-variant* LunaTokis and
'LunaTokis' -> the fixed-x4 original (and, as shipped, NameErrors on both —
it imports neither module; fixed here)."""

from __future__ import annotations


def define_g(opt: dict):
    from stif_tpu.models import LunaTokis, TMNet
    from stif_tpu.models.luna_tokis_variants import (
        LunaTokisNoFlow,
        LunaTokisS,
        LunaTokisTrain,
        LunaTokisZSM,
    )

    net = opt["network_G"]
    which = net["which_model_G"]
    kwargs = dict(
        nf=net.get("nf", 64), nframes=net.get("nframes", 6),
        groups=net.get("groups", 8), front_RBs=net.get("front_RBs", 5),
        back_RBs=net.get("back_RBs", 40),
    )
    if which == "LIIF":
        for key in ("gather_dtype", "mlp_dtype"):
            if net.get(key) in ("bf16", "bfloat16"):
                import jax.numpy as jnp

                kwargs[key] = jnp.bfloat16
        if net.get("rgb_skip"):
            kwargs["rgb_skip"] = True
            # network_G.rgb_skip: bicubic — skip gathers a bicubic
            # pre-upsample (see LunaTokis.rgb_skip_bicubic)
            if str(net.get("rgb_skip")).lower() == "bicubic":
                kwargs["rgb_skip_bicubic"] = True
        if net.get("encode_splitk"):
            kwargs["encode_splitk"] = True
        if net.get("stagec_dedup"):
            kwargs["stagec_dedup"] = True
        if net.get("lstm_fuse_dirs") is not None:
            kwargs["lstm_fuse_dirs"] = bool(net.get("lstm_fuse_dirs"))
        if net.get("stagec_nearest"):
            kwargs["stagec_nearest"] = True
        if net.get("stagec_dtype"):
            import jax.numpy as jnp

            kwargs["stagec_dtype"] = {
                "fp8": jnp.float8_e4m3fn, "float8_e4m3fn": jnp.float8_e4m3fn,
                "bf16": jnp.bfloat16, "bfloat16": jnp.bfloat16,
            }[str(net.get("stagec_dtype"))]
        return LunaTokis(**kwargs)
    if which == "LIIF_train":
        return LunaTokisTrain(**kwargs)
    if which == "LIIF_noflow":
        return LunaTokisNoFlow(**kwargs)
    if which == "LIIF_S":
        return LunaTokisS(**kwargs)
    if which == "LunaTokis":
        return LunaTokisZSM(**kwargs)
    if which == "TMNet":
        return TMNet(**kwargs)
    if which.startswith("LIIF_"):
        from stif_tpu.models.ablations import _PRESETS, make_ablation

        preset = which[len("LIIF_"):]
        if preset in _PRESETS:
            return make_ablation(preset, **kwargs)
    raise NotImplementedError(f"Generator model [{which}] not recognized")
