from .message import MESSAGE_SCHEMA, TOPIC_CONFIG_SCHEMA, WEBHOOK_SCHEMA  # noqa: F401
from .topic import (  # noqa: F401
    TopicStatus,
    build_topic_fn,
    tokenize_topic_full_name,
    gen_key_from_names,
    topic_key_col,
    tenant_from_topic_col,
    validate_topic_config,
    validate_webhook_config,
    get_subscription_type,
    get_initial_position,
)
from .config_store import ConfigStore, InMemoryConfigStore, changelog_snapshot  # noqa: F401
