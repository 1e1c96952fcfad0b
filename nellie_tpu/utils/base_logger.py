"""Global logger for nellie_tpu.

Mirrors the reference's logging surface (``nellie/utils/base_logger.py:7-13``):
a module-level ``logger`` with file:lineno formatting at INFO level.
"""
import logging

logging.basicConfig(
    level=logging.INFO,
    format="%(asctime)s - %(levelname)s - %(filename)s:%(lineno)s - %(message)s",
)

logger = logging.getLogger("nellie_tpu")
logger.setLevel(logging.INFO)
