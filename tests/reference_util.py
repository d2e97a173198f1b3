"""Helpers to load the frozen PyTorch reference (read-only, golden-test only).

The reference at /root/reference is used purely as a numerical oracle: we
instantiate its modules with random weights, copy those weights into our JAX
models, and assert allclose.  No reference code is imported into the package.
"""
import sys
import types

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)


def _stub(name, **attrs):
    """Install a minimal fake module so reference imports resolve (the stubs
    are never exercised by the code paths we test)."""
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod


class _Any:
    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):
        return None


def _permissive(name):
    if name in sys.modules:
        return
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__getattr__ = lambda attr: _Any  # PEP 562: any attribute -> dummy class
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    mod.__file__ = f"<stub {name}>"
    sys.modules[name] = mod


_stub("torchmetrics")
_stub("torchmetrics.classification", MulticlassAccuracy=_Any)
_permissive("torchaudio")
_permissive("torchaudio.transforms")
_permissive("torchaudio.functional")
_permissive("torchaudio.compliance")
_permissive("torchaudio.compliance.kaldi")
# wire submodule attributes on parents so `from torchaudio.compliance import
# kaldi` resolves to the stub modules, not the parent's permissive __getattr__
sys.modules["torchaudio"].transforms = sys.modules["torchaudio.transforms"]
sys.modules["torchaudio"].functional = sys.modules["torchaudio.functional"]
sys.modules["torchaudio"].compliance = sys.modules["torchaudio.compliance"]
sys.modules["torchaudio.compliance"].kaldi = sys.modules["torchaudio.compliance.kaldi"]


class _DictConfig(dict):
    def __init__(self, content=None, **kw):
        super().__init__()
        data = content.get("content", content) if isinstance(content, dict) else {}
        self.update(data)

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e


_stub("omegaconf", DictConfig=_DictConfig)


def _install_diffusers_stub():
    if "diffusers" in sys.modules:
        return
    import importlib.util

    import os

    spec = importlib.util.spec_from_file_location(
        "tests._diffusers_stub", os.path.join(os.path.dirname(__file__), "diffusers_stub.py"))
    stub = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(stub)
    _stub("diffusers")
    _stub("diffusers.models")
    _stub("diffusers.models.activations", get_activation=stub.get_activation)
    _stub("diffusers.models.attention", GEGLU=stub.GEGLU, GELU=stub.GELU,
          AdaLayerNorm=stub.AdaLayerNorm, AdaLayerNormZero=stub.AdaLayerNormZero,
          ApproximateGELU=stub.ApproximateGELU)
    _stub("diffusers.models.attention_processor", Attention=stub.Attention)
    _stub("diffusers.models.lora", LoRACompatibleLinear=stub.LoRACompatibleLinear)
    _stub("diffusers.utils")
    _stub("diffusers.utils.torch_utils", maybe_allow_in_graph=stub.maybe_allow_in_graph)
    _stub("conformer", ConformerBlock=stub.ConformerBlock)
    _permissive("onnxruntime")
    _permissive("librosa")
    _permissive("librosa.filters")
    sys.modules["librosa"].filters = sys.modules["librosa.filters"]


_install_diffusers_stub()

# the reference JIT-compiles its CUDA extension at import time (load.py:48-121)
# — short-circuit that module; tests only exercise the torch path.
_stub("cosyvoice.BigVGAN.alias_free_activation.cuda.activation1d",
      Activation1d=_Any)


def ref_state_dict(mod):
    return {k: v.detach().cpu().numpy() for k, v in mod.state_dict().items()}
