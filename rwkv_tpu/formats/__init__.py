from rwkv_tpu.formats import quant  # noqa: F401
from rwkv_tpu.formats.container import (  # noqa: F401
    RWKVFileHeader,
    RWKVTensorRecord,
    read_model_file,
    read_model_header,
    write_model_file,
)
