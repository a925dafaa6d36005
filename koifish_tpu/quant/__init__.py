from koifish_tpu.quant.qtensor import QTensor, NF4_CODEBOOK, NF3_CODEBOOK, codebook_for  # noqa: F401
from koifish_tpu.quant.rtn import quantize, quantize_best, quant_error, fake_quant  # noqa: F401
from koifish_tpu.quant.packing import pack_codes, unpack_codes  # noqa: F401
