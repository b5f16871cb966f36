"""System factory builds a representative of every family from configs."""
import pytest

from fscl_tpu.core.config import (
    DataConfig, ModelConfig, OptimConfig, UpstreamConfig,
)
from fscl_tpu.frontend import register_unit_symbols
from fscl_tpu.systems.factory import build_system

register_unit_symbols("factory-units", 16)

DATA = [
    DataConfig(name="a", lang_id=0, symbol_id="en",
               text_cleaners=("basic_cleaners",), unit_name="factory-units"),
]
CFG = ModelConfig(upstream=UpstreamConfig(name="tiny", dim=16, n_layers=2))


@pytest.mark.parametrize("key,cls_name", [
    ("baseline", "BaselineSystem"),
    ("fscl-orig", "TransEmbSystem"),
    ("fscl-orig2", "MAMLTransEmbSystem"),
    ("fscl-orig-tune", "TransEmbTuneSystem"),
    ("fscl-ada1", "TransEmbADASystem"),
    ("fscl-ada2", "TransEmbADASystem"),
    ("fscl-ssl_ada1", "TransEmbSSLADASystem"),
    ("conti-ae", "ContiAESystem"),
    ("semi-fscl", "SemiTransEmbSystem"),
    ("tacot2u", "TacoT2USystem"),
    ("fscl-t2u", "TransEmbT2USystem"),
    ("fscl-t2u-codebook", "TransEmbCT2USystem"),
    ("fscl-t2u-codebook2", "TransEmbC2T2USystem"),
    ("fscl-t2u-tune", "T2UTuneSystem"),
    ("fscl-t2u-da-tune", "DATuneSystem"),
    ("pr-ssl-baseline", "SSLBaselineSystem"),
    ("pr-ssl-cluster", "SSLClusterSystem"),
    ("pr-ssl-protonet", "SSLProtoNetSystem"),
])
def test_factory_builds(key, cls_name):
    system = build_system(key, CFG, OptimConfig(), DATA)
    assert type(system).__name__ == cls_name


def test_ada_stage_wiring():
    s1 = build_system("fscl-ada1", CFG, OptimConfig(), DATA)
    s2 = build_system("fscl-ada2", CFG, OptimConfig(), DATA)
    assert s1.ada_stage == "matching"
    assert s2.ada_stage == "unsup_tuning"
