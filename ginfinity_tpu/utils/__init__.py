from ginfinity_tpu.utils.io import (
    log_setup,
    log_information,
    read_table,
    setup_and_read_input,
)

__all__ = ["log_setup", "log_information", "read_table", "setup_and_read_input"]
