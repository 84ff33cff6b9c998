"""Ray Data execution-context helpers.

None of these call ray.init(); the driver owns the session (see
__ray_entry__.py contract).
"""

from __future__ import annotations


def configure_data_context(
    target_max_block_size: int | None = None,
    preserve_order: bool = False,
    quiet: bool = True,
) -> None:
    """Configure the ambient Ray Data context for engine pipelines.

    - progress bars / verbose logs off for test + bench output hygiene
    - ``preserve_order`` off by default (we sort explicitly where order
      matters, letting the streaming executor pipeline freely)
    """
    from ray.data import DataContext

    ctx = DataContext.get_current()
    if target_max_block_size is not None:
        ctx.target_max_block_size = target_max_block_size
    ctx.execution_options.preserve_order = preserve_order
    if quiet:
        import logging

        ctx.enable_progress_bars = False
        try:
            ctx.execution_options.verbose_progress = False
        except AttributeError:
            pass
        logging.getLogger("ray.data").setLevel(logging.WARNING)
