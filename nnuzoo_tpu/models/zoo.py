"""Imports every model family so trainer-name registration happens.

Each family module calls ``register_model`` at import. Families are added here as
they are implemented; see SURVEY.md §2.2 for the full inventory.
"""

# model families register themselves on import
from . import light_munet  # noqa: F401
from . import lm2net  # noqa: F401
from . import ssnd2net  # noqa: F401
from . import mamba_nd2net  # noqa: F401
from . import m2net  # noqa: F401
from . import x2net  # noqa: F401
from . import seg_mamba  # noqa: F401
from . import swin_umamba  # noqa: F401
from . import swt  # noqa: F401
from . import swt2net  # noqa: F401
from . import u2net  # noqa: F401
from . import u2net_multi  # noqa: F401
from . import unetr  # noqa: F401
from . import unetr2net  # noqa: F401
