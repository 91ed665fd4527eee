import { x } from "./x";

export class Panel {
  constructor() {
    this.n = 0;
  }

  async load(url) {
    if (url) {
      return fetch(url);
    }
    return null;
  }

  static get size() {
    return 4;
  }
}
