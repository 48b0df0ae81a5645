#pragma once
namespace message_filters {
template <class M>
class Subscriber {};
}
