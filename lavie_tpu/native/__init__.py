from lavie_tpu.native.mjpeg import (
    is_available as mjpeg_available,
    read_avi,
    probe_avi,
    write_avi,
)

__all__ = ["mjpeg_available", "read_avi", "probe_avi", "write_avi"]
