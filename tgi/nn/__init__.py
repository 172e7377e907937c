from tgi.nn.layers import (
    fully_connected_init, fully_connected_apply,
    conv2d_layer_init, conv2d_layer_apply,
    modulated_conv2d, normalize_2nd_moment,
)
from tgi.nn.mapping import mapping_network_init, mapping_network_apply
from tgi.nn.synthesis import (
    synthesis_layer_init, synthesis_layer_apply,
    torgb_layer_init, torgb_layer_apply,
    synthesis_block_init, synthesis_block_apply,
    synthesis_network_init, synthesis_network_apply,
    synthesis_num_ws, block_resolutions,
)
from tgi.nn.superres import superresolution_init, superresolution_apply
