"""Package-level registry surface: every model family the reference ships
(codes/models/modules/*) must be constructible straight from
``stif_tpu.models`` with no extra imports (docs/MIGRATION.md model-zoo table).

Construction only (flax modules are dataclasses) — no init/compile, so this
stays in the fast tier.
"""

import pytest

REGISTRY_NAMES = [
    "LunaTokis",        # Sakuya_arch_test.py deployed LIIF
    "LunaTokisTrain",   # Sakuya_arch.py fold-27 train head
    "LunaTokisZSM",     # STVSR.py pixel-shuffle head
    "LunaTokisS",       # Sakuya_arch_test_S.py
    "LunaTokisNoFlow",  # Sakuya_arch_test_noflow.py
    "TMNet",            # my_arch.py
    "LIIF_test3",
    "LIIF_test4",
    "LIIF_test5",
    "LIIF_nomul",
    "LIIF_single",
    "LIIF_continuous",
]


@pytest.mark.parametrize("name", REGISTRY_NAMES)
def test_make_model_from_package(name):
    from stif_tpu.models import make_model

    model = make_model(name)
    assert model is not None


def test_mlp_registered():
    from stif_tpu.models import make_model

    assert make_model("mlp", out_dim=3, hidden_list=[8]) is not None


def test_package_reexports():
    import stif_tpu.models as m

    for cls in ["LunaTokis", "LunaTokisTrain", "LunaTokisZSM", "LunaTokisS",
                "LunaTokisNoFlow", "TMNet", "MLP"]:
        assert hasattr(m, cls), cls
    from stif_tpu.runtime import ChunkedDecoder  # noqa: F401  (MIGRATION.md)


def test_unknown_name_lists_inventory():
    from stif_tpu.models import make_model

    with pytest.raises(KeyError) as ei:
        make_model("definitely_not_a_model")
    # the error should enumerate what IS available
    assert "LunaTokis" in str(ei.value)
