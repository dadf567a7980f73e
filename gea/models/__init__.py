"""Model definitions (reference C3/C4/C7: `g_lis/common.py`,
`r_iterative/common.py` — per-approach model modules, SURVEY.md §2)."""

from gea.models.generator import GeneratorLIS, generator_plan  # noqa: F401
from gea.models.discriminator import Discriminator  # noqa: F401
from gea.models.reverter import Reverter  # noqa: F401
