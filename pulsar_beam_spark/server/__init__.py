from .gateway import (  # noqa: F401
    GatewayApp,
    Route,
    effective_routes,
    make_server,
    receiver_header,
    verify_subject,
    verify_subject_based_on_topic,
)
from .store import TopicDirStore  # noqa: F401
