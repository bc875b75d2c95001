from eventstorm_spark.streaming.subscriptions import Subscription, subscribe_all, subscribe_stream

__all__ = ["Subscription", "subscribe_all", "subscribe_stream"]
