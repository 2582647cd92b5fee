from .image_bytes import ImageBytesDataset  # noqa: F401
from .image_folder import ImageFolderDataset  # noqa: F401
