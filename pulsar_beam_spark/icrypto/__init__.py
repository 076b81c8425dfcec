from .cipher import AESCipher, RSACipher  # noqa: F401
from .jwt_rs256 import (  # noqa: F401
    RSAKeyPair,
    auth_verify_jwt,
    decode_token,
    generate_token,
    get_token_subject,
    load_pem_private_key,
    load_pem_public_key,
    mint_token,
    rs256_sign,
    rs256_verify,
    verify_token_subject,
)
