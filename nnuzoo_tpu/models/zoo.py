"""Imports every model family so trainer-name registration happens.

Each family module calls ``register_model`` at import. Families are added here as
they are implemented; see SURVEY.md §2.2 for the full inventory.
"""

# u2net, swin, unetr, ss2d/m2net etc. register themselves on import.
from . import u2net  # noqa: F401
