"""Registry parity guard: every algorithm key the reference exposes
(lightning/systems/__init__.py:9-64) must resolve to a system here, and the
datamodule registry must cover the training-relevant families."""
import pytest


REFERENCE_SYSTEM_KEYS = [
    # SYSTEM_SYNTHESIS
    "baseline", "baseline-tune", "conti-ae", "fscl-orig", "fscl-orig-tune",
    "fscl-ada1", "fscl-ada2", "fscl-ssl_ada1", "fscl-ssl_ada2",
    # SYSTEM_PR
    "pr-ssl-linear-tune", "pr-ssl-baseline", "pr-ssl-cluster",
    "pr-ssl-baseline-tune", "pr-ssl-cluster-tune", "pr-ssl-protonet",
    # SYSTEM_T2U
    "tacot2u", "fscl-t2u", "fscl-t2u-orig", "fscl-t2u-codebook",
    "fscl-t2u-codebook2", "fscl-t2u-tune", "fscl-t2u-orig-tune",
    "fscl-t2u-orig-e2e-tune", "fscl-t2u-da-tune", "fscl-t2u-e2e-tune",
    "fscl-t2u-c-e2e-tune", "fscl-t2u-c2-e2e-tune", "fscl-t2u-da-e2e-tune",
    "fscl-t2u-c-da-e2e-tune", "fscl-t2u-c2-da-e2e-tune",
]


def test_all_reference_system_keys_registered():
    import fscl_tpu.systems  # populate
    from fscl_tpu.core.registry import SYSTEMS
    missing = [k for k in REFERENCE_SYSTEM_KEYS if k not in SYSTEMS]
    assert not missing, missing


def test_datamodule_registry_covers_families():
    import fscl_tpu.data.datamodules
    import fscl_tpu.data.mix_datamodules
    from fscl_tpu.core.registry import DATAMODULES
    for key in ("baseline", "fscl", "fscl-orig", "tacot2u", "fscl-t2u",
                "pr-ssl-linear", "pr-ssl-protonet", "fscl-t2u-e2e-tune",
                "fscl-t2u-da-tune", "fscl-orig-tune"):
        assert key in DATAMODULES, key


def test_get_system_and_datamodule_lookup():
    from fscl_tpu.systems import get_system
    from fscl_tpu.data.datamodules import get_datamodule
    assert get_system("baseline").__name__ == "BaselineSystem"
    assert get_datamodule("fscl").__name__ == "FSCLDataModule"
    with pytest.raises(KeyError):
        get_system("no-such-system")


def test_every_system_has_a_datamodule():
    """CLI generic train path needs both registries aligned
    (lightning/datamodules/__init__.py:6-50 key map)."""
    import fscl_tpu.data.datamodules  # noqa: F401
    import fscl_tpu.data.mix_datamodules  # noqa: F401
    import fscl_tpu.systems  # noqa: F401
    from fscl_tpu.core.registry import DATAMODULES, SYSTEMS
    missing = set(SYSTEMS._items) - set(DATAMODULES._items)
    assert not missing, f"systems without datamodule: {sorted(missing)}"


def test_datamodule_kwargs_routing():
    from fscl_tpu.data.datamodules import datamodule_kwargs_for
    assert datamodule_kwargs_for("fscl-orig2") == {"with_sup_batch": True}
    from fscl_tpu.core.config import AlgorithmConfig, AdaptConfig
    cfg = AlgorithmConfig(adapt=AdaptConfig(shots=4, queries=2))
    kw = datamodule_kwargs_for("fscl-orig2", cfg)
    assert kw["shots"] == 4 and kw["queries"] == 2 and kw["with_sup_batch"]
    assert datamodule_kwargs_for("fscl-ssl_ada1") == {"with_qry_wavs": True}
    assert datamodule_kwargs_for("baseline") == {}
