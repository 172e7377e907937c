from tgi.utils.image import to_uint8, save_image, save_image_grid
