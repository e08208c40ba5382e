from pnpinversion_tpu.data.pie_bench import (
    mask_decode,
    mask_encode,
    load_512,
    PieBenchItem,
    PieBenchDataset,
)
