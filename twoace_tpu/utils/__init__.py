from .units import (  # noqa: F401
    amplitude_to_dbm,
    db2pow,
    dbm_to_amplitude,
    pow2db,
    rssi_to_dbm,
)
