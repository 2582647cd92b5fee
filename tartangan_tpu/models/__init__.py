from .pluggan import (  # noqa: F401
    Discriminator,
    Generator,
    IQNDiscriminator,
)
