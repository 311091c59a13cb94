"""Host-side utilities: HDF5 and wav I/O, file listing, prefetch."""

from pytorchwavenetvocoder_tpu.utils.hdf5 import (  # noqa: F401
    check_hdf5,
    read_hdf5,
    shape_hdf5,
    write_hdf5,
)
from pytorchwavenetvocoder_tpu.utils.files import find_files, read_txt  # noqa: F401
from pytorchwavenetvocoder_tpu.utils.prefetch import BackgroundGenerator, background  # noqa: F401
from pytorchwavenetvocoder_tpu.utils.timing import extend_time  # noqa: F401
from pytorchwavenetvocoder_tpu.utils.wavio import read_wav, write_wav  # noqa: F401
