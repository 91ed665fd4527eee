import type { Conn } from "./conn";
import("./side-effect");

export abstract class Service<T> {
  private cache: Map<string, T> = new Map();

  // method_signature members: NOT method_definition nodes
  abstract describe(): string;
  abstract touch(): void

  private lookup(key: string): T | undefined
  private lookup(key: string): T | undefined {
    return this.cache.get(key);
  }

  static of<T>(conn: Conn): Service<T> {
    return null as any;
  }

  *entries(): IterableIterator<string> {
    yield "a";
  }

  async *stream(
    prefix: string,
    limit: number,
  ): AsyncIterableIterator<string> {
    yield prefix + limit;
  }

  protected override reload(
    force: boolean
  ) {
    if (force) {
      this.cache.clear();
    }
  }
}
